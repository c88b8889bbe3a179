from clip_glass_tpu.metrics.fid import FID, frechet_distance  # noqa: F401
from clip_glass_tpu.metrics.ppl import PPL  # noqa: F401
