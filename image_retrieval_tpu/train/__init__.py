from image_retrieval_tpu.train.trainer import CLIPTrainer, clip_contrastive_loss  # noqa: F401
from image_retrieval_tpu.train.pipelined import PipelinedCLIPTrainer  # noqa: F401
from image_retrieval_tpu.train.data import contrastive_batches, finetune_on_color_dataset  # noqa: F401
