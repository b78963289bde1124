"""Programmatic job API (ref: multioptpy/Wrapper/{optimize,neb,md,ieip}_wrapper.py).

The reference's Jobs mutate an argparse namespace and call the CLI drivers;
here each Job is a thin object wrapper over the functional drivers with
keyword options, for users composing workflows in Python:

    job = OptimizationJob("mol.xyz", calculator="lj", method="rfo_fsb")
    result = job.run()
"""

import numpy as np

from multioptpy_tpu.calculators import get_calculator
from multioptpy_tpu.io import read_xyz
from multioptpy_tpu.periodic import symbols_to_z
from multioptpy_tpu.units import ANGSTROM2BOHR


class _Job:
    def __init__(self, input_file=None, coords=None, z=None, symbols=None,
                 calculator="lj", charge=0, multiplicity=1, calc_options=None,
                 **options):
        import jax.numpy as jnp

        if input_file is not None:
            symbols, coords_ang = read_xyz(input_file)
            z = symbols_to_z(symbols)
            coords = jnp.asarray(coords_ang * ANGSTROM2BOHR)
        self.symbols = symbols
        self.coords = coords
        self.z = jnp.asarray(z)
        self.calc = get_calculator(calculator, charge=charge,
                                   multiplicity=multiplicity,
                                   **(calc_options or {}))
        self.options = options
        self.result = None

    def set_options(self, **kw):
        """ref: optimize_wrapper.py set_options."""
        self.options.update(kw)
        return self


class OptimizationJob(_Job):
    """ref: Wrapper/optimize_wrapper.py:5."""

    def run(self):
        from multioptpy_tpu.drivers.optimize import OptimizeConfig, optimize

        constraints = self.options.pop("constraints", None)
        bias = self.options.pop("bias_engine", None)
        config = OptimizeConfig(**self.options)
        self.result = optimize(self.calc, self.coords, self.z,
                               bias_engine=bias, config=config,
                               constraints=constraints)
        return self.result


class NEBJob(_Job):
    """ref: Wrapper/neb_wrapper.py:5."""

    def __init__(self, *a, end_input=None, end_coords=None, n_images=12,
                 **kw):
        super().__init__(*a, **kw)
        import jax.numpy as jnp

        if end_input is not None:
            _, end_ang = read_xyz(end_input)
            end_coords = jnp.asarray(end_ang * ANGSTROM2BOHR)
        self.end_coords = end_coords
        self.n_images = n_images

    def run(self):
        from multioptpy_tpu.drivers.neb import (
            NEBConfig, interpolate_linear, neb)

        path0 = self.options.pop("path0", None)
        if path0 is None:
            path0 = interpolate_linear(self.coords, self.end_coords,
                                       self.n_images)
        config = NEBConfig(**self.options)
        self.result = neb(self.calc, path0, self.z, config)
        return self.result


class MDJob(_Job):
    """ref: Wrapper/md_wrapper.py."""

    def run(self):
        from multioptpy_tpu.drivers.md import MDConfig, run_md

        bias = self.options.pop("bias_engine", None)
        config = MDConfig(**self.options)
        self.result = run_md(self.calc, self.coords, self.z, config,
                             bias_engine=bias)
        return self.result


class IEIPJob(_Job):
    """ref: Wrapper/ieip_wrapper.py."""

    def __init__(self, *a, end_input=None, end_coords=None, **kw):
        super().__init__(*a, **kw)
        import jax.numpy as jnp

        if end_input is not None:
            _, end_ang = read_xyz(end_input)
            end_coords = jnp.asarray(end_ang * ANGSTROM2BOHR)
        self.end_coords = end_coords

    def run(self):
        from multioptpy_tpu.drivers.ieip import IEIPConfig, ieip

        config = IEIPConfig(**self.options)
        self.result = ieip(self.calc, self.coords, self.end_coords, self.z,
                           config)
        return self.result


class AutoTSJob(_Job):
    """ref: Wrapper/autots.py (v1 workflow as a job)."""

    def __init__(self, *a, product_coords=None, **kw):
        super().__init__(*a, **kw)
        self.product_coords = product_coords

    def run(self):
        from multioptpy_tpu.workflows.autots import AutoTSConfig, autots

        config = AutoTSConfig(**self.options)
        self.result = autots(self.calc, self.coords, self.z, config,
                             product_coords=self.product_coords)
        return self.result
