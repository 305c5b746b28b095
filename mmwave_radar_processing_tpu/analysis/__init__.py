"""Analysis layer: error statistics for estimated-vs-ground-truth histories."""

from mmwave_radar_processing_tpu.analysis.analyzers import BaseAnalyzer, VelocityAnalyzer

__all__ = ["BaseAnalyzer", "VelocityAnalyzer"]
