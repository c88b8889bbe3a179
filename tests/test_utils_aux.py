"""Auxiliary subsystem tests: profiling utilities, data pipeline, image
grids, Pareto scatter, pytree npz round trip."""

import os
import time

import numpy as np
import pytest

from clip_glass_tpu.core import pytree
from clip_glass_tpu.core.profiling import GenerationMeter, Timer, ValueTracker
from clip_glass_tpu.utils.data import ImageFolder, find_images, load_image
from clip_glass_tpu.utils.image import make_grid, save_grid
from clip_glass_tpu.utils.plotting import save_scatter


def test_timer_formats():
    with Timer("x") as t:
        time.sleep(0.01)
    assert t.seconds >= 0.01
    assert Timer.format(2.5) == "2.500 s"
    assert Timer.format(2.5e-3) == "2.500 ms"
    assert "us" in Timer.format(5e-6)


def test_value_tracker_ema():
    v = ValueTracker(beta=0.5)
    v.add("loss", 1.0)
    v.add("loss", 0.0)
    assert v.value("loss") == pytest.approx(0.5)
    assert v.raw("loss") == 0.0
    assert "loss=" in v.format()


def test_generation_meter():
    m = GenerationMeter(pop_size=16)
    m.update(10)
    time.sleep(0.01)
    g = m.gens_per_sec
    c = m.candidates_per_sec
    assert g > 0
    # the two reads happen at slightly different times; allow drift
    assert c == pytest.approx(g * 16, rel=0.2)


def test_generation_meter_rebaseline():
    m = GenerationMeter(pop_size=16)
    # plain set_generation pins the counter without touching the clock
    m.set_generation(50)
    time.sleep(0.01)
    assert m.gens_per_sec > 0
    # explicit rebaseline restarts the clock: no elapsed work yet -> rate 0
    m.set_generation(100, rebaseline=True)
    assert m.gens_per_sec == 0.0
    m.set_generation(110)
    time.sleep(0.01)
    assert m.gens_per_sec > 0


def test_image_folder_pipeline(tmp_path):
    from PIL import Image
    for i in range(3):
        Image.fromarray((np.random.default_rng(i).uniform(0, 255, (20, 24, 3))
                         ).astype(np.uint8)).save(tmp_path / f"img{i}.png")
    assert len(find_images(str(tmp_path))) == 3
    arr = load_image(str(tmp_path / "img0.png"), 16)
    assert arr.shape == (3, 16, 16)
    assert arr.min() >= -1.0 and arr.max() <= 1.0
    ds = ImageFolder(str(tmp_path), resolution=16, batch_size=4, prefetch=False)
    batch = next(iter(ds))
    assert batch.shape == (4, 3, 16, 16)


def test_image_folder_missing_dir(tmp_path):
    with pytest.raises(FileNotFoundError):
        ImageFolder(str(tmp_path / "empty"), 16, 2)


def test_make_grid_layout():
    imgs = np.zeros((5, 3, 4, 4), np.float32)
    grid = make_grid(imgs, nrow=3, padding=1)
    # 2 rows x 3 cols of 4px + padding
    assert grid.shape == (3, 1 + 2 * 5, 1 + 3 * 5)


def test_save_scatter_single_objective(tmp_path):
    p = tmp_path / "f.jpg"
    save_scatter(np.array([[0.1], [0.5]]), str(p))
    assert p.exists()


def test_pytree_npz_roundtrip_with_lists(tmp_path):
    import jax.numpy as jnp
    tree = {"a": jnp.ones((2,)), "blocks": [{"w": jnp.zeros((3,))},
                                            {"w": jnp.ones((3,))}]}
    path = str(tmp_path / "t.npz")
    pytree.save_npz(path, tree)
    loaded = pytree.load_npz(path)
    np.testing.assert_array_equal(np.asarray(loaded["a"]), np.ones(2))
    np.testing.assert_array_equal(np.asarray(loaded["blocks"]["1"]["w"]), np.ones(3))
    assert pytree.n_params(tree) == 8


def test_progress_writer(capsys):
    import io
    from clip_glass_tpu.core.profiling import ProgressWriter
    buf = io.StringIO()
    pw = ProgressWriter(total=3, label="gen", stream=buf)
    pw.update(1, best=0.5)
    pw.update(2)
    out = buf.getvalue()
    assert "3/3 (100%)" in out and "best=0.5" in out
    assert out.endswith("\n")


def test_save_grid_uint8_matches_float(tmp_path):
    """The device-side uint8 quantization path (fitness generator.save)
    must produce the same pixels as the float path."""
    import numpy as np
    from PIL import Image

    from clip_glass_tpu.utils.image import save_grid

    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (4, 3, 8, 8)).astype(np.float32)
    u8 = np.clip(imgs * 255.0 + 0.5, 0, 255).astype(np.uint8)
    pf, pu = str(tmp_path / "f.png"), str(tmp_path / "u.png")
    save_grid(imgs, pf)
    save_grid(u8, pu)
    np.testing.assert_array_equal(np.asarray(Image.open(pf)),
                                  np.asarray(Image.open(pu)))


def test_validate_pretrained_skips_cleanly_without_checkpoints(tmp_path):
    """scripts/validate_pretrained.py is the pretrained-validation harness;
    without any checkpoints every check must SKIP (not FAIL) and the exit
    code must be 0."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "validate_pretrained.py"),
         "--weights-dir", str(tmp_path / "none"),
         "--out", str(tmp_path / "out")],
        capture_output=True, text=True,
        env=dict(os.environ, JAX_PLATFORMS="cpu"))
    assert r.returncode == 0, r.stdout[-800:] + r.stderr[-800:]
    assert "0 failed" in r.stdout
    assert "SKIP" in r.stdout and "FAIL]" not in r.stdout


def test_enable_compile_cache_respects_env(monkeypatch, tmp_path):
    """An explicit JAX_COMPILATION_CACHE_DIR must not be clobbered."""
    import jax

    from clip_glass_tpu.core.backend import enable_compile_cache

    before = jax.config.jax_compilation_cache_dir
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "user"))
    enable_compile_cache(str(tmp_path / "ours"))
    assert jax.config.jax_compilation_cache_dir == before


def test_image_folder_prefetch_abandoned_iterator_stops(tmp_path):
    """Each prefetching iterator owns its RNG and stop event: abandoning an
    iterator and starting another must neither race the generator state nor
    leave the first worker producing forever."""
    import threading
    import time

    from PIL import Image
    for i in range(3):
        Image.fromarray((np.random.default_rng(i).uniform(0, 255, (20, 24, 3))
                         ).astype(np.uint8)).save(tmp_path / f"img{i}.png")
    ds = ImageFolder(str(tmp_path), resolution=8, batch_size=2, prefetch=True)
    it1 = iter(ds)
    b1 = next(it1)
    assert b1.shape == (2, 3, 8, 8)
    n_before = threading.active_count()
    it2 = iter(ds)  # signals it1's worker to stop
    b2 = next(it2)
    assert b2.shape == (2, 3, 8, 8)
    deadline = time.time() + 5.0
    while threading.active_count() > n_before and time.time() < deadline:
        time.sleep(0.05)
    # the abandoned worker exits once its stop event is set (bounded by the
    # 0.25 s put timeout); only it2's worker remains
    assert threading.active_count() <= n_before


def test_misc_helpers_match_reference_semantics():
    """utils/misc.py: the reference's grab-bag helpers (stylegan2/utils.py
    AttributeDict/to_list/bool_type/range_type) behave identically."""
    import argparse
    import pickle

    import pytest as _pytest

    from clip_glass_tpu.utils import (AttributeDict, bool_type, range_type,
                                      to_list)

    d = AttributeDict(a=1)
    d.b = {"x": 2}
    assert d.a == 1 and d["b"]["x"] == 2
    with _pytest.raises(AttributeError):
        _ = d.missing
    del d.a
    assert "a" not in d
    rt = pickle.loads(pickle.dumps(d))
    assert rt == d and isinstance(rt, AttributeDict)
    nested = AttributeDict.convert_dict_recursive(
        {"top": {"inner": {"leaf": 3}}, "plain": 4})
    assert nested.top.inner.leaf == 3 and nested.plain == 4

    assert to_list(None) == []
    assert to_list((1, 2)) == [1, 2]
    assert to_list(5) == [5]
    assert to_list([7]) == [7]

    assert bool_type("Yes") is True and bool_type("0") is False
    assert bool_type(True) is True
    with _pytest.raises(argparse.ArgumentTypeError):
        bool_type("maybe")

    assert list(range_type("2-5")) == [2, 3, 4, 5]
    assert range_type("1,4,9") == [1, 4, 9]


def test_tune_tpu_compiler_env_logic(monkeypatch):
    """tune_tpu_compiler sets the scoped-VMEM default exactly once, appends
    to (never clobbers) an existing LIBTPU_INIT_ARGS, defers to a user who
    already set the flag, and honors the opt-out env."""
    from clip_glass_tpu.core.backend import tune_tpu_compiler

    monkeypatch.delenv("LIBTPU_INIT_ARGS", raising=False)
    monkeypatch.delenv("CLIP_GLASS_NO_TPU_TUNING", raising=False)
    tune_tpu_compiler()
    assert os.environ["LIBTPU_INIT_ARGS"] == \
        "--xla_tpu_scoped_vmem_limit_kib=65536"
    tune_tpu_compiler()  # idempotent: the flag is already present
    assert os.environ["LIBTPU_INIT_ARGS"].count("scoped_vmem") == 1

    monkeypatch.setenv("LIBTPU_INIT_ARGS", "--xla_tpu_other_flag=1")
    tune_tpu_compiler()
    assert os.environ["LIBTPU_INIT_ARGS"] == \
        "--xla_tpu_other_flag=1 --xla_tpu_scoped_vmem_limit_kib=65536"

    user = "--xla_tpu_scoped_vmem_limit_kib=16384"
    monkeypatch.setenv("LIBTPU_INIT_ARGS", user)
    tune_tpu_compiler()
    assert os.environ["LIBTPU_INIT_ARGS"] == user  # user's value wins

    monkeypatch.delenv("LIBTPU_INIT_ARGS", raising=False)
    monkeypatch.setenv("CLIP_GLASS_NO_TPU_TUNING", "1")
    tune_tpu_compiler()
    assert "LIBTPU_INIT_ARGS" not in os.environ
