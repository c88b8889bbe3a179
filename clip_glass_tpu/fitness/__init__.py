from clip_glass_tpu.fitness.latent import decode_biggan, decode_gpt2, decode_stylegan2  # noqa: F401
from clip_glass_tpu.fitness.generator import Generator  # noqa: F401
from clip_glass_tpu.fitness.problem import GenerationProblem  # noqa: F401
