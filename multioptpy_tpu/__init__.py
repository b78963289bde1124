"""multioptpy_tpu — TPU-native geometry optimization & transition-state search.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of ss0832/MultiOptPy
(reference layout: /root/reference/multioptpy). Everything between quantum-
chemistry gradient calls runs on TPU as jitted, batched (vmap) and sharded
(shard_map over an ICI mesh) pure functions; host QM backends are bridged with
`jax.pure_callback`. Bias potentials are differentiable JAX functions; step
engines (RS-RFO family, quasi-Newton updates, FIRE/L-BFGS/CG) are dense-linear-
algebra kernels shaped (B, 3N) so ensembles of structures advance in lockstep.

Subpackages
-----------
units / periodic   constants & element data (ref: multioptpy/Parameters/)
io                 xyz / trajectory / gjf parsing (ref: multioptpy/fileio.py)
calculators        energy backends (ref: multioptpy/Calculator/)
potentials         bias potentials (ref: multioptpy/Potential/)
hessian            updates + model Hessians (ref: multioptpy/Optimizer/hessian_update.py, ModelHessian/)
steppers           step engines (ref: multioptpy/Optimizer/, optimizer.py)
coords             internal coordinates & projections (ref: multioptpy/Coordinate/)
constraints        SHAKE / projection constraints (ref: multioptpy/Constraint/)
drivers            optimize / NEB / IRC / MD / iEIP loops (ref: multioptpy/{optimization,neb,irc,moleculardynamics,ieip}.py)
parallel           device-mesh sharding of ensembles (new TPU-native capability)
analysis           vibrations / thermochemistry / PES analysis (ref: multioptpy/Thermo/, PESAnalyzer/)
workflows          AutoTS / conformer search / scans / mapper (ref: multioptpy/Wrapper/, Entrypoints/)
"""

__version__ = "0.1.0"

from multioptpy_tpu import units  # noqa: F401
from multioptpy_tpu import periodic  # noqa: F401
