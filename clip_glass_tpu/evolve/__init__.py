from clip_glass_tpu.evolve import sampling, crossover, mutation, selection, nds, survival  # noqa: F401
from clip_glass_tpu.evolve.algorithm import GAState, make_algorithm, minimize  # noqa: F401
from clip_glass_tpu.evolve.batched import make_batched, minimize_batched  # noqa: F401
