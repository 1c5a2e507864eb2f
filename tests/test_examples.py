"""Example scripts stay runnable (in-process, under the CPU conftest)."""

import runpy
import sys

import pytest

pytestmark = pytest.mark.slow


def run_example(name):
    runpy.run_path(f"examples/{name}", run_name="__main__")


def test_laplace_quickstart(capsys):
    run_example("01_laplace_quickstart.py")
    out = capsys.readouterr().out
    assert "marglik after tuning" in out
    assert "should be larger" in out


def test_graph_structure_learning(capsys):
    run_example("02_graph_structure_learning.py")
    out = capsys.readouterr().out
    assert "learned graph" in out
    assert "Bayes test metrics" in out


def test_calibration(capsys):
    run_example("03_calibration.py")
    out = capsys.readouterr().out
    assert "Laplace probit" in out


def test_predictive_samples():
    """Public predictive_samples API (reference baselaplace :1074-1121)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from laplace_gnn_tpu import DiagLaplace, FunctionalLaplace
    from laplace_gnn_tpu.nn import MLP
    from laplace_gnn_tpu.utils.data import ArrayLoader

    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    X = jax.random.normal(keys[0], (10, 3))
    y = jax.random.randint(keys[1], (10,), 0, 2)
    model = MLP([3, 4, 2], act="tanh")
    params = model.init(keys[2])
    la = DiagLaplace(model, params, "classification")
    la.fit(ArrayLoader(X, y))
    s = la.predictive_samples(X, pred_type="glm", n_samples=13)
    assert s.shape == (13, 10, 2)
    np.testing.assert_allclose(np.asarray(s.sum(-1)), 1.0, atol=1e-6)
    s2 = la.predictive_samples(X, pred_type="nn", n_samples=7)
    assert s2.shape == (7, 10, 2)

    gp = FunctionalLaplace(model, params, "classification", n_subset=10)
    gp.fit(ArrayLoader(X, y))
    s3 = gp.predictive_samples(X, n_samples=5)
    assert s3.shape == (5, 10, 2)


def test_distributed_marglik(capsys):
    jax = pytest.importorskip("jax")
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh conftest")
    run_example("05_distributed_marglik.py")
    out = capsys.readouterr().out
    assert "distributed marglik pipeline OK" in out
    assert "schedule=ring" in out


def test_regression(capsys):
    run_example("06_regression.py")
    assert "regression example OK" in capsys.readouterr().out


def test_bayesopt(capsys):
    run_example("07_bayesopt.py")
    assert "bayesopt example OK" in capsys.readouterr().out


def test_reward_modeling(capsys):
    run_example("08_reward_modeling.py")
    assert "reward modeling example OK" in capsys.readouterr().out


@pytest.mark.slow
def test_gp_calibration(capsys):
    run_example("09_gp_calibration.py")
    assert "gp calibration example OK" in capsys.readouterr().out


def test_multihost_launch_example(tmp_path):
    """examples/10_multihost_launch.py exercises the documented env-var
    launch path (LAPLACE_GNN_COORDINATOR/NUM_PROCESSES/PROCESS_ID,
    parallel/distributed.py::initialize) end-to-end: single-process and a
    real 2-process Gloo run must print identical replicated scalars."""
    import os
    import re
    import subprocess

    ex = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "10_multihost_launch.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS",) and not k.startswith("LAPLACE_GNN_")}
    env["JAX_PLATFORMS"] = "cpu"

    single = subprocess.run([sys.executable, ex], cwd=str(tmp_path), env=env,
                            capture_output=True, text=True, timeout=300)
    assert single.returncode == 0, single.stderr[-2000:]
    assert "[single process]" in single.stdout

    spawned = subprocess.run([sys.executable, ex, "--spawn", "2"],
                             cwd=str(tmp_path), env=env, capture_output=True,
                             text=True, timeout=420)
    assert spawned.returncode == 0, spawned.stderr[-2000:]
    assert "[process 0/2]" in spawned.stdout
    assert "[process 1/2]" in spawned.stdout

    def scalars(out):
        return sorted(set(re.findall(r"neg_marglik=([\d.]+) \|grad\|=([\d.]+)",
                                     out)))

    s1, s2 = scalars(single.stdout), scalars(spawned.stdout)
    assert len(s1) == 1 and len(s2) == 1, (s1, s2)
    assert s1 == s2, (s1, s2)


def test_learned_graph_evolution(capsys, tmp_path, monkeypatch):
    monkeypatch.setattr(sys, "argv", ["x", str(tmp_path)])
    run_example("11_learned_graph_evolution.py")
    out = capsys.readouterr().out
    assert "figures written" in out
    for fn in ("adj_initial.png", "adj_learned.png", "homophily.png",
               "edge_types.png", "degrees.png"):
        assert (tmp_path / fn).exists(), fn


def test_dict_input_llm_head(capsys):
    run_example("12_dict_input_llm_head.py")
    out = capsys.readouterr().out
    assert "dict-input predictive sums to 1: OK" in out


def test_flash_attention_gat(capsys):
    run_example("13_flash_attention_gat.py")
    out = capsys.readouterr().out
    assert "flash GAT marglik training" in out
    assert "predictive rows" in out
