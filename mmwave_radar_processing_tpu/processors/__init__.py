"""Signal-processing pipeline stages (TPU-native re-design).

Each reference processor class (``mmwave_radar_processing/processors/``)
becomes here a thin config-bound object whose ``process`` methods are pure,
shape-static jitted functions over device arrays.  Stateless stages are plain
functions of the ADC cube; stateful stages (altimeter tracking, micro-Doppler
history, synthetic-aperture ring buffers) expose ``init_state()`` and a
functional ``step(state, ...) -> (state, out)`` suitable for ``lax.scan`` over
frame sequences.  Every stage also accepts a leading batch axis via ``vmap``
for throughput-mode processing of many frames at once.
"""

from mmwave_radar_processing_tpu.processors.virtual_array import VirtualArrayReformatter
from mmwave_radar_processing_tpu.processors.range_resp import RangeProcessor
from mmwave_radar_processing_tpu.processors.range_doppler import RangeDopplerProcessor
from mmwave_radar_processing_tpu.processors.range_angle import RangeAngleProcessor
from mmwave_radar_processing_tpu.processors.doppler_azimuth import DopplerAzimuthProcessor
from mmwave_radar_processing_tpu.processors.micro_doppler import MicroDopplerProcessor
from mmwave_radar_processing_tpu.processors.altimeter import Altimeter

__all__ = [
    "VirtualArrayReformatter",
    "RangeProcessor",
    "RangeDopplerProcessor",
    "RangeAngleProcessor",
    "DopplerAzimuthProcessor",
    "MicroDopplerProcessor",
    "Altimeter",
]
