from clip_glass_tpu.models.biggan.model import (  # noqa: F401
    BIGGAN_DEEP_128,
    BIGGAN_DEEP_256,
    BIGGAN_DEEP_512,
    CONFIGS,
    PRECAST_EXCLUDE,
    TINY,
    BigGANConfig,
    apply,
    init,
    truncated_noise_sample,
)
