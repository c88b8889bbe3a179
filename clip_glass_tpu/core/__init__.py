from clip_glass_tpu.core.dtypes import Policy, resolve_dtype  # noqa: F401
from clip_glass_tpu.core import pytree  # noqa: F401
