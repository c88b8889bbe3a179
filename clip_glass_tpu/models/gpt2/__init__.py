from clip_glass_tpu.models.gpt2.model import (  # noqa: F401
    GPT2Config,
    GPT2_124M,
    forward,
    init,
    sample_sequence,
)
