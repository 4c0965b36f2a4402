from ospo_tpu.engine.image_engine import ImageGenEngine  # noqa: F401
from ospo_tpu.engine.text_engine import TextGenEngine  # noqa: F401
