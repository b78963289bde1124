"""Every module imports cleanly (catches dead code / broken imports)."""

import importlib
import pkgutil

import multioptpy_tpu


def test_all_modules_import():
    failures = []
    for mod in pkgutil.walk_packages(multioptpy_tpu.__path__,
                                     prefix="multioptpy_tpu."):
        try:
            importlib.import_module(mod.name)
        except ImportError as e:
            # host QM backends are import-gated by design
            if any(k in str(e) for k in ("tblite", "pyscf", "psi4", "ase")):
                continue
            failures.append((mod.name, str(e)))
        except Exception as e:  # noqa: BLE001
            failures.append((mod.name, f"{type(e).__name__}: {e}"))
    assert not failures, failures
