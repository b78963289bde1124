"""Pre-measure reference-side (torch CPU) bench timings into
bench_ref_cache.json so driver bench runs never pay them live.

The reference numbers are hardware-stable on this box (see the
_REF_CACHE_FILE comment in bench.py); warming them here keeps the
expensive rows (98-atom SQM2 gradient ~445 s, run_autots HCN ~132 s)
out of the BENCH_BUDGET_S wall-clock budget. Run on CPU only:

    JAX_PLATFORMS=cpu python tools/warm_ref_cache.py
"""
import contextlib
import io
import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

import bench  # noqa: E402  (import-light: no jax at module level)


def warm_sqm2_grad_98atom():
    from multioptpy_tpu.io.fixtures import alkane_chain
    from multioptpy_tpu.units import BOHR2ANGSTROM

    if "multioptpy" not in sys.modules:
        pkg = types.ModuleType("multioptpy")
        pkg.__path__ = ["/root/reference/multioptpy"]
        sys.modules["multioptpy"] = pkg
    from multioptpy.SQM.sqm2.sqm2_core import SQM2Calculator

    coords_bohr, z = alkane_chain(32)
    c_np = np.asarray(coords_bohr) * BOHR2ANGSTROM
    z_np = np.asarray(z)

    def measure():
        with contextlib.redirect_stdout(io.StringIO()):
            t0 = time.perf_counter()
            rc = SQM2Calculator(xyz=c_np, element_list=z_np,
                                charge=0, spin=0)
            rc.total_gradient(c_np)
            return (time.perf_counter() - t0) * 1e3

    val, cached = bench._ref_cached("sqm2_grad_alkane_c32h66_98atom_ms",
                                    measure)
    print(f"sqm2_grad_alkane_c32h66_98atom_ms = {val:.1f} "
          f"(cached={cached})", flush=True)


def warm_run_autots_hcn():
    import shutil
    import tempfile

    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    cfg_src = os.path.join(here, "examples", "ab",
                           "config_autots_sqm2_ab.json")
    xyz_src = os.path.join(here, "examples", "ab", "hcn.xyz")

    def measure():
        with tempfile.TemporaryDirectory() as tmp:
            shutil.copy(xyz_src, os.path.join(tmp, "hcn.xyz"))
            shutil.copy(cfg_src, os.path.join(tmp, "config_ab.json"))
            open(os.path.join(tmp, "software_path.conf"), "w").close()
            ref_wall, ref_tail = bench._run_reference_cli(
                ["run_autots", "hcn.xyz", "-cfg", "config_ab.json"],
                cwd=tmp, timeout_s=1800)
        return {"wall_s": ref_wall,
                "refined": "did not converge" not in ref_tail}

    val, cached = bench._ref_cached("run_autots_hcn_ab", measure)
    print(f"run_autots_hcn_ab = {json.dumps(val)} (cached={cached})",
          flush=True)


if __name__ == "__main__":
    warm_run_autots_hcn()
    warm_sqm2_grad_98atom()
    print("done", flush=True)
