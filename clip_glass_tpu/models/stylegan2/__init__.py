from clip_glass_tpu.models.stylegan2.model import (  # noqa: F401
    SG2Config,
    CONFIG_F,
    discriminator_apply,
    discriminator_init,
    generator_apply,
    generator_init,
    mapping_apply,
    synthesis_apply,
)
