"""Utilities: observability (logging, profiling)."""

from tpupose.utils.profiling import StageTimer, annotate, trace
from tpupose.utils.reporting import TrainLogger, dump_run_params
