from multioptpy_tpu.calculators.base import Calculator, get_calculator  # noqa: F401
from multioptpy_tpu.calculators.lj import LennardJones  # noqa: F401
