"""Full CLI workflow on a tiny generated toy dataset:
generate -> train -> extract DRSA data -> optimize subspaces -> eval pieces.

Runs the scripts' main() in-process (CPU) with tiny sizes; validates the
reference's cluster workflow end to end (getdrsadata + optsubspaces + cpf)."""

import os
import sys
import subprocess

import numpy as np
import pytest

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")


def run_script(name, *args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # force jax cpu despite the axon sitecustomize
    path = os.path.abspath(os.path.join(SCRIPTS, name))
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        f"import sys; sys.argv = ['{name}'] + {list(args)!r};"
        f"src = open(r'{path}').read();"
        f"exec(compile(src, r'{path}', 'exec'), "
        f"{{'__file__': r'{path}', '__name__': '__main__'}})"
    )
    res = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=560, env=env)
    assert res.returncode == 0, f"{name} failed:\n{res.stdout}\n{res.stderr}"
    return res.stdout


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("cli")


def test_cli_workflow(workdir):
    data = str(workdir / "toy")
    models = str(workdir / "model")
    drsa_data = str(workdir / "drsa_data")
    subspaces = str(workdir / "subspaces")

    out = run_script("generate_toydata.py", "--out", data, "--per-class", "12",
                     "--seed", "1")
    assert "train: 16 samples" in out

    run_script("train.py", "--case", "toy", "--data", data, "--out", models,
               "--epochs", "2", "--batch-size", "8")
    assert os.path.exists(os.path.join(models, "ckpt_2"))

    run_script("extract_drsa_data.py", "--case", "toy", "--data", data,
               "--checkpoint", models, "--epoch", "2", "--out", drsa_data,
               "--layers", "10", "--num-locations", "8")
    f = os.path.join(drsa_data, "class1", "dataset_layer10.npz")
    assert os.path.exists(f)
    arr = np.load(f)
    assert arr["activations"].shape[-1] == 16

    run_script("optimize_subspaces.py", "--data", drsa_data, "--out", subspaces,
               "--num-concepts", "2", "--steps", "20", "--runs", "2")
    u_file = os.path.join(subspaces, "class1", "layer10", "run1",
                          "projection_matrix.npy")
    assert os.path.exists(u_file)
    U = np.load(u_file)
    np.testing.assert_allclose(U.T @ U, np.eye(16), atol=5e-3)
