from .base import CDFBackedPredictor, Predictor, StaticCDF, Uniform  # noqa: F401
from .classical import (  # noqa: F401
    AdaptiveOrder0,
    CountsPredictor,
    FSMPredictor,
    HistoryRL,
    MarkovMix,
)
from .ppm import PPM  # noqa: F401
