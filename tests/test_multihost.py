"""Two-process (multi-controller) execution of the GSPMD sharded step.

Launches two coordinated CPU processes (4 virtual devices each -> an
8-device global mesh spanning processes) and checks the sharded coupled
step against a single-process reference computed by the parent — the
framework's substitute for the reference's `mpiexec -np N` runs
(/root/reference/README.md:62-66), with real cross-process collectives
(Gloo over localhost standing in for DCN).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; ref_path = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
sys.path.insert(0, os.environ["REPO_ROOT"])
from fem_glass_tempering_tpu.parallel import multihost
multihost.initialize(f"localhost:{port}", 2, pid)
import jax
jax.config.update("jax_enable_x64", True)
assert len(jax.devices()) == 8, jax.devices()
assert jax.process_count() == 2

import numpy as np
from fem_glass_tempering_tpu.config import (
    FEConfig, OutputConfig, RunConfig, SolverConfig, TimeConfig,
)
from fem_glass_tempering_tpu.fem.mesh import box_mesh_3d

mesh = box_mesh_3d(12, 6, 3, 1.0, 1.0, 0.01)
cfg = RunConfig(
    fe=FEConfig(T_family="CG", T_degree=1),
    time=TimeConfig(0.0, 0.2, 0.1),
    solver=SolverConfig(linear_operator="stencil"),
    output=OutputConfig(write_every=0, formats=()),
)

sp = multihost.make_multihost_problem(mesh, cfg)
st, ok, ni, ki = sp.run(sp.init_state(), 2)
assert ok, "Newton failed in multihost run"
gathered = multihost.gather_to_host(st)
flat = sp._to_flat(gathered)

T_ref = np.load(ref_path)["T"]
rel = np.abs(np.asarray(flat.T) - T_ref).max() / np.abs(T_ref).max()
assert rel < 1e-11, f"multihost T mismatch rel={rel}"
print(f"proc {pid}: OK rel={rel:.2e} newton={ni} cg={ki}", flush=True)
"""


@pytest.mark.slow
def test_two_process_sharded_step(tmp_path):
    # single-process reference, computed here (same config as the workers)
    from fem_glass_tempering_tpu.config import (
        FEConfig, OutputConfig, RunConfig, SolverConfig, TimeConfig,
    )
    from fem_glass_tempering_tpu.fem.mesh import box_mesh_3d
    from fem_glass_tempering_tpu.models.problem import ThermoViscoProblem

    mesh = box_mesh_3d(12, 6, 3, 1.0, 1.0, 0.01)
    cfg = RunConfig(
        fe=FEConfig(T_family="CG", T_degree=1),
        time=TimeConfig(0.0, 0.2, 0.1),
        solver=SolverConfig(linear_operator="stencil"),
        output=OutputConfig(write_every=0, formats=()),
    )
    prob = ThermoViscoProblem(mesh=mesh, config=cfg)
    prob.setup()
    ref = prob.solve()
    ref_path = tmp_path / "ref.npz"
    np.savez(ref_path, T=np.asarray(ref.T))

    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)          # drop the axon sitecustomize
    env["REPO_ROOT"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    procs = [
        subprocess.Popen([sys.executable, str(script), str(pid), str(port),
                          str(ref_path)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1500)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert "OK" in out


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port
