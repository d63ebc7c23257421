"""pycricodecs_tpu: a TPU-native batched CRIWARE codec framework.

A from-scratch rebuild of the capabilities of Youjose/PyCriCodecs with a
JAX/XLA/Pallas compute path (batched ADX/HCA transcode on TPU) and a C++ host
core for bitstream work. Public API mirrors the reference package:
ADX, HCA, CPK, CPKBuilder, USM, USMBuilder, UTF, UTFBuilder, ACB, ACBBuilder,
AWB, AWBBuilder, IVF — plus new batched entry points under
pycricodecs_tpu.parallel.
"""
from .models.adx import ADX

__all__ = ["ADX"]
__version__ = "0.1.0"
