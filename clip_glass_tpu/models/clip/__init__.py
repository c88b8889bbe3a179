from clip_glass_tpu.models.clip.model import (  # noqa: F401
    VIT_B_32,
    CLIPConfig,
    encode_image,
    encode_text,
    init,
    preprocess_sizes,
)
