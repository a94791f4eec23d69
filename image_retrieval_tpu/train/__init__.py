from image_retrieval_tpu.train.trainer import CLIPTrainer, clip_contrastive_loss  # noqa: F401
