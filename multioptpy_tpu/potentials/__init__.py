from multioptpy_tpu.potentials.base import (  # noqa: F401
    BiasEngine,
    BiasPotential,
    available_potentials,
    get_potential,
)
from multioptpy_tpu.potentials import afir  # noqa: F401
from multioptpy_tpu.potentials import extra  # noqa: F401
from multioptpy_tpu.potentials import angles  # noqa: F401
from multioptpy_tpu.potentials import keep  # noqa: F401
from multioptpy_tpu.potentials import misc  # noqa: F401
from multioptpy_tpu.potentials import repulsive  # noqa: F401
from multioptpy_tpu.potentials import well  # noqa: F401
from multioptpy_tpu.potentials import ellipsoid  # noqa: F401
from multioptpy_tpu.potentials.afir import AFIRPotential  # noqa: F401
