"""Transforms: STFT/iSTFT frontend, phase reconstruction, gammatone.

The reference (pb_bss/transform/__init__.py) exposes GriffinLim/MISI
and outsources the STFT to nara_wpe; this framework owns the STFT.
"""
from . import stft_module  # noqa: F401
from .stft_module import stft, istft, STFT  # noqa: F401
from .griffin_lim_module import GriffinLim, MISI  # noqa: F401
from . import gammatone  # noqa: F401
from .gammatone import gammatone_filterbank  # noqa: F401
from . import filters  # noqa: F401
