"""auvtpu — TPU-native real-time bathymetry interpolation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
devsaxena974/AUV-Real-Time-Interpolation (CPU C++ + CUDA study of bilinear /
bicubic / ordinary-kriging interpolation for AUV deep-sea mapping):

- :mod:`auvtpu.grid`      — device-resident regular grid (mask, not NaN)
- :mod:`auvtpu.ops`       — XLA/Pallas interpolation ops (scattered + dense)
- :mod:`auvtpu.golden`    — float64 host oracle, bit-matched to the reference
- :mod:`auvtpu.metrics`   — reference-biased and corrected error metrics
- :mod:`auvtpu.masking`   — seeded fault-injection masking pipeline
- :mod:`auvtpu.synthetic` — closed-form synthetic bathymetry
- :mod:`auvtpu.io`        — GEBCO netCDF + reference-schema CSVs
- :mod:`auvtpu.parallel`  — mesh/sharding (query DP, spatial grid sharding)
- :mod:`auvtpu.scattered` — scattered-data -> grid pipelines (MXU kNN)
- :mod:`auvtpu.cli`       — benchmark/demo entry points (the 4 executables)
"""

__version__ = "0.1.0"

from .config import EngineConfig, Extent, FallbackConfig, IDWConfig, KrigingConfig, VariogramConfig
from .grid import RegularGrid

__all__ = [
    "EngineConfig",
    "Extent",
    "FallbackConfig",
    "IDWConfig",
    "KrigingConfig",
    "VariogramConfig",
    "RegularGrid",
    "__version__",
]
