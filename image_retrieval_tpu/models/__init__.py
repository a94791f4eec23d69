from image_retrieval_tpu.models.clip import CLIP, CLIPVisionTower, CLIPTextTower  # noqa: F401
from image_retrieval_tpu.models.encoder import Encoder, FakeEncoder, CLIPEncoder  # noqa: F401
