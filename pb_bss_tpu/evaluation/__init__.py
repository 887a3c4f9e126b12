"""Evaluation layer (reference: pb_bss/evaluation/__init__.py)."""
from .module_mir_eval import mir_eval_sources  # noqa: F401
from .module_bss_eval import bss_eval_sources  # noqa: F401
from .module_bss_eval_device import (  # noqa: F401
    bss_eval_sources_batch,
    bss_eval_sources_device,
    mir_eval_sources_batch,
)
from .module_stoi_device import stoi_batch, stoi_device  # noqa: F401
from .module_pesq import pesq  # noqa: F401
from .module_srmr import srmr  # noqa: F401
from .module_srmr_device import srmr_batch, srmr_device  # noqa: F401
from .module_stoi import stoi  # noqa: F401
from .module_si_sdr import si_sdr  # noqa: F401
from .sxr_module import input_sxr, output_sxr, get_snr  # noqa: F401
from .wrapper import InputMetrics, OutputMetrics  # noqa: F401
from .batch_wrapper import (  # noqa: F401
    InputMetricsBatch,
    OutputMetricsBatch,
)
