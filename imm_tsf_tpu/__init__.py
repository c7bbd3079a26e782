"""imm-tsf-tpu: TPU-native framework for irregular multimodal time-series
forecasting (JAX / XLA / Pallas / pjit).

Re-designed from scratch with the capabilities of the IMM-TSF reference
(Time-IMM benchmark library, arXiv:2506.10412): 9 datasets, 11 forecasting
backbones in 3 families, a TTF/MMF text-fusion stack, frozen-LLM text
embedding, masked-MSE training with early stopping, and masked
MSE/MAE/RMSE/MAPE evaluation — built TPU-first on static shapes, lax.scan
time loops, pjit data parallelism, and Pallas fusion kernels.
"""

__version__ = "0.1.0"

from .config import Config, apply_presets  # noqa: F401
