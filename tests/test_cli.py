"""CLI contract tests: artifact files of reference run.py (genetic-it-*,
genetic_result, F.jpg, ls_result, output.*) + resume."""

import os
import pickle

import numpy as np
import pytest

from clip_glass_tpu.cli import main
from clip_glass_tpu.evolve import decision


def test_decision_pseudo_weights_prefers_low_second_objective():
    F = np.array([[0.0, 1.0], [0.5, 0.5], [1.0, 0.0]])
    # weights (0,1): all weight on objective 2 -> pick the point minimizing it
    assert decision.pick(F, (0, 1)) == 2


def test_decision_asf_fallback_on_degenerate_front():
    F = np.array([[0.0, 1.0], [0.0, 0.2]])  # objective-1 range collapses
    idx = decision.pick(F, (0, 1))
    assert idx == 1  # lower second objective


def test_cli_nsga2_tiny_end_to_end(tmp_path):
    tmp = str(tmp_path / "out")
    rc = main(["--config", "StyleGAN2_ffhq_d", "--target", "a red flower",
               "--generations", "2", "--save-each", "2",
               "--tmp-folder", tmp, "--tiny", "--pop-size", "8"])
    assert rc == 0
    assert os.path.exists(os.path.join(tmp, "genetic-it-final.jpg"))
    assert os.path.exists(os.path.join(tmp, "output.jpg"))
    assert os.path.exists(os.path.join(tmp, "F.jpg"))
    assert os.path.exists(os.path.join(tmp, "ls_result.npz"))
    with open(os.path.join(tmp, "genetic_result"), "rb") as f:
        res = pickle.load(f)
    assert set(res) == {"X", "F", "G", "CV"}
    assert np.atleast_2d(res["F"]).shape[1] == 2


def test_cli_ga_tiny_and_resume(tmp_path):
    tmp = str(tmp_path / "out")
    rc = main(["--config", "StyleGAN2_ffhq_nod", "--target", "a red flower",
               "--generations", "2", "--save-each", "2",
               "--tmp-folder", tmp, "--tiny", "--pop-size", "8"])
    assert rc == 0
    assert os.path.exists(os.path.join(tmp, "ga_state.npz"))
    with np.load(os.path.join(tmp, "ga_state.npz")) as d:
        assert int(d["gen"]) == 2
    # resume for 2 more generations
    rc = main(["--config", "StyleGAN2_ffhq_nod", "--target", "a red flower",
               "--generations", "4", "--save-each", "2",
               "--tmp-folder", tmp, "--tiny", "--pop-size", "8", "--resume"])
    assert rc == 0
    with np.load(os.path.join(tmp, "ga_state.npz")) as d:
        assert int(d["gen"]) == 4
    ls = np.load(os.path.join(tmp, "ls_result.npz"))
    assert ls["z"].shape == (8, 32)
