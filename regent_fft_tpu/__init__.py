"""regent_fft_tpu — a TPU-native FFT framework (JAX / XLA / Pallas).

A from-scratch rebuild of the capabilities of Regent-FFT
(arjunkunna/regent-fft-arjun, mounted at /root/reference) designed for TPU:

* plan lifecycle (make_plan / execute_plan / destroy_plan) with a wisdom
  cache — ``src/fft.rg:262,544,625`` analog;
* 1D/2D/3D (and arbitrary-rank) C2C, R2C, C2R; forward + inverse;
  complex64/complex128 plus split-bf16 ``complex32``;
* mixed-radix matmul-form (MXU) execution with Bluestein fallback,
  fused Pallas VMEM kernels on the hot path;
* batched transforms over arbitrary batch axes;
* distributed transforms over a device mesh: per-shard (reference parity),
  slab, and pencil decompositions with ``all_to_all`` over ICI;
* FFTW-style verification (impulse/linearity/shift/golden) and
  5N·log2(N) GFLOP/s benchmark conventions.
"""

from .dtypes import Direction, Kind, Norm, SplitComplex, as_split, from_split
from .plan import (Plan, PlanSpec, make_plan, execute_plan, destroy_plan,
                   clear_plan_cache, cached_plans, cleanup)
from .api import (fft, ifft, fft2, ifft2, fftn, ifftn,
                  rfft, irfft, rfft2, irfft2, rfftn, irfftn,
                  fftshift, ifftshift, fftfreq, rfftfreq, hfft, ihfft,
                  hfft2, ihfft2, hfftn, ihfftn,
                  set_workers, get_workers,
                  generate_fft_interface, FFTInterface)
from .utils.measure import set_timelimit, get_timelimit, NO_TIMELIMIT
from .ops.factor import next_fast_len, prev_fast_len
from .parallel.mesh import (make_fft_mesh, make_pencil_mesh,
                            make_multislice_mesh)
from .parallel.distributed import (DistributedFFTPlan, make_plan_shards,
                                   make_plan_slab, make_plan_pencil,
                                   make_plan_slab_r2c, make_plan_slab_c2r,
                                   make_plan_pencil_r2c, make_plan_pencil_c2r,
                                   make_plan_slab_1d,
                                   unpack_halfcomplex_rank1,
                                   pack_halfcomplex_rank1,
                                   make_plan_distributed, destroy_plan_distrib)
from .parallel.transpose import (TransposePlan, make_plan_transpose,
                                 make_plan_many_transpose)
from .parallel.distributed_r2r import (DistributedR2RPlan,
                                       make_plan_slab_r2r)
from .utils import wisdom
from .utils.wisdom import (export_wisdom_to_string, export_wisdom_to_filename,
                           import_wisdom_from_string, import_wisdom_from_filename,
                           forget_wisdom, gather_wisdom, broadcast_wisdom)
from .utils.calibrate import calibrate, Calibration
from .guru import (IODim, GuruPlan, GuruR2RPlan, plan_guru, plan_guru_r2r,
                   plan_many)
from .ops.r2r import (R2RKind, R2RPlan, plan_r2r, r2r, dct, dst, dht,
                      idct, idst, idht, dctn, idctn, dstn, idstn)
from .signal import (fftconvolve, oaconvolve, correlate, stft, istft,
                     hilbert, hilbert2, resample)
from .spectral import periodogram, welch, csd, coherence, spectrogram
from ._czt import CZT, ZoomFFT, czt, zoom_fft
from .ops.fftlog import fht, ifht, fhtoffset
from .ops.nufft import (nufft1d1, nufft1d2, nufft2d1, nufft2d2,
                        nufft3d1, nufft3d2, nufft1d3, nufft2d3, nufft3d3)

__version__ = "0.1.0"

# System-wisdom autoload (fftw import-system-wisdom analog): calibration
# and tuned winners persist across processes via $REGENT_FFT_WISDOM.
wisdom.autoload_system_wisdom()

FORWARD = Direction.FORWARD
BACKWARD = Direction.BACKWARD


def __getattr__(name):
    # Lazy ecosystem adapters (PEP 562): rft.torch_fft must not import
    # torch (and rft.scipy_backend must not touch scipy's uarray
    # machinery) unless actually used.
    if name in ("torch_fft", "scipy_backend"):
        import importlib
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
