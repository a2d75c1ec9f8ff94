"""mellon-tpu: a TPU-native probabilistic inference framework with the
capabilities of settylab/Mellon (non-parametric cell-state density,
dimensionality, time-sensitive density and function estimation on sparse
Gaussian processes with a nearest-neighbor-distance likelihood).

Unlike the reference (``mellon/__init__.py:44-59``), importing this package
has no JAX side effects: the platform and precision are whatever the host
program configured, so TPU executions stay f32/bf16 on the MXU by default.
"""

import logging
import sys

from .version import __version__
from .config import setup_jax, set_jax_config
from .ops.kernels import Covariance
from .utils import util
from .utils import validation
from .models import (
    DensityEstimator,
    DimensionalityEstimator,
    FunctionEstimator,
    TimeSensitiveDensityEstimator,
)
from .inference.predictors import Predictor
from .ops import kernels as cov
from . import parameters
from . import inference
from . import models as model
from .inference import conditionals as conditional
from .inference import derivatives
from .utils.util import set_verbosity

# Register the legacy namespace aliases as importable module paths so
# ``from mellon_tpu.util import distance`` works like the reference's
# ``from mellon.util import distance`` (``mellon/_util.py`` etc.), not just
# attribute access.
for _name, _mod in (
    ("util", util),
    ("cov", cov),
    ("model", model),
    ("conditional", conditional),
    ("validation", validation),
    ("derivatives", derivatives),
):
    sys.modules[__name__ + "." + _name] = _mod

logger = logging.getLogger("mellon_tpu")
if not logger.handlers:
    _handler = logging.StreamHandler(sys.stdout)
    _handler.setFormatter(
        logging.Formatter("[%(asctime)s] [%(levelname)-8s] %(message)s")
    )
    logger.addHandler(_handler)
    logger.setLevel(logging.INFO)
    logger.propagate = False

__all__ = [
    "DensityEstimator",
    "FunctionEstimator",
    "DimensionalityEstimator",
    "TimeSensitiveDensityEstimator",
    "Predictor",
    "Covariance",
    "__version__",
    "setup_jax",
    "set_jax_config",
    "util",
    "cov",
    "model",
    "parameters",
    "inference",
    "conditional",
    "derivatives",
    "validation",
    "logger",
    "set_verbosity",
]
