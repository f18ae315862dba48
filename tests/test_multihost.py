"""REAL multi-process execution of the multi-host path (SURVEY §2e P7).

Launches TWO OS processes that bring up ``jax.distributed`` over a
localhost coordinator (``initialize_multihost``,
parallel/render_sharded.py), each owning 2 virtual CPU devices, and
render the Cornell scene over the resulting 4-device GLOBAL mesh —
cross-process coordination, a mesh spanning processes, and the
allgather frame assembly are all genuinely exercised (the reference
never left devices[0], smallptGPU.cpp:463-467). The assembled frame
must be BITWISE equal to a single-process render of the same config
(multi-host determinism: RNG keys derive from absolute pixel ids,
SURVEY §7 hard part 6).

Driven through ``scripts/multihost_bench.py --distributed`` so the
production CLI path itself is what runs.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "scripts", "multihost_bench.py")

W, H, SPP = 64, 64, 2
SCENE = "cornell"


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_matches_single_process(tmp_path):
    port = _free_port()
    dump = tmp_path / "distributed.npy"
    out = tmp_path / "distributed.json"

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # children force their own device count
    # The axon sitecustomize registers the TPU PJRT plugin at interpreter
    # start, which initializes the XLA backend BEFORE
    # jax.distributed.initialize can run. The children are CPU-only by
    # design — disarm the plugin.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("JAX_PLATFORMS", None)

    def proc(pid):
        cmd = [
            sys.executable, BENCH,
            "--distributed", "--virtual", "2",
            "--coordinator", f"127.0.0.1:{port}",
            "--nproc", "2", "--pid", str(pid),
            "--width", str(W), "--height", str(H), "--spp", str(SPP),
            "--scene", SCENE, "--reps", "1",
        ]
        if pid == 0:
            cmd += ["--dump-image", str(dump), "--out", str(out)]
        return subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd=REPO,
        )

    p0, p1 = proc(0), proc(1)
    try:
        o0, e0 = p0.communicate(timeout=600)
        o1, e1 = p1.communicate(timeout=600)
    except subprocess.TimeoutExpired:
        p0.kill()
        p1.kill()
        raise
    assert p0.returncode == 0, f"pid0 failed:\n{e0[-2000:]}"
    assert p1.returncode == 0, f"pid1 failed:\n{e1[-2000:]}"

    meta = json.loads(out.read_text())
    assert meta["n_processes"] == 2, meta
    assert meta["results"][0]["mesh_devices"] == 4, meta

    # Single-process reference on this process's CPU backend (the suite
    # runs with 8 virtual devices; a 1-device mesh is the plain render).
    import jax

    from se195_raytracer_tpu.core.config import RenderConfig
    from se195_raytracer_tpu.parallel.mesh import make_mesh
    from se195_raytracer_tpu.parallel.render_sharded import render_sharded
    from se195_raytracer_tpu.scenes.registry import get_scene

    spec = get_scene(SCENE)
    cfg = RenderConfig(width=W, height=H, spp=SPP, seed=0)
    ref, _ = render_sharded(
        spec.to_scene(), spec.to_camera(), cfg,
        mesh=make_mesh(jax.devices()[:1]),
    )
    ref = np.asarray(ref)

    got = np.load(dump)
    assert got.shape == ref.shape
    assert np.array_equal(got, ref), (
        f"distributed frame differs from single-process: "
        f"max |d| = {np.abs(got - ref).max()}"
    )
