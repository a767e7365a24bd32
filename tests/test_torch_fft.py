"""torch.fft drop-in namespace (regent_fft_tpu.torch_fft).

The adapter mirrors torch.fft (the modern cuFFT entry point — the
engine the reference dispatches to at /root/reference/src/fft.rg:574-580)
so torch programs can switch engines with one import.  Every row checks
name-for-name, argument-for-argument agreement with torch's own result.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from regent_fft_tpu import torch_fft as tfft


def _agree(ours, ref, tol=2e-5):
    ours = ours.resolve_conj().numpy()
    ref = ref.resolve_conj().numpy()
    assert ours.shape == ref.shape
    assert ours.dtype == ref.dtype
    denom = max(np.linalg.norm(ref), 1e-30)
    assert np.linalg.norm(ours - ref) / denom < tol


@pytest.mark.parametrize("name,kw", [
    ("fft", {}), ("ifft", {}), ("fft", {"n": 20}), ("fft", {"n": 12}),
    ("fft", {"norm": "ortho"}), ("ifft", {"norm": "forward"}),
    ("rfft", {}), ("ihfft", {}),
])
def test_1d_complex_input_free(name, kw):
    x = torch.randn(3, 16)
    _agree(getattr(tfft, name)(x, **kw), getattr(torch.fft, name)(x, **kw))


@pytest.mark.parametrize("name,kw", [
    ("fft", {"dim": 0}), ("ifft", {"dim": -2}),
])
def test_1d_complex_over_dims(name, kw):
    x = torch.randn(8, 16, dtype=torch.complex64)
    _agree(getattr(tfft, name)(x, **kw), getattr(torch.fft, name)(x, **kw))


@pytest.mark.parametrize("name,kw", [
    ("irfft", {}), ("irfft", {"n": 16}), ("hfft", {}),
])
def test_1d_real_output(name, kw):
    x = torch.randn(3, 9, dtype=torch.complex64)
    _agree(getattr(tfft, name)(x, **kw), getattr(torch.fft, name)(x, **kw))


@pytest.mark.parametrize("name", ["fft2", "ifft2", "rfft2", "ihfft2"])
def test_2d(name):
    x = torch.randn(2, 12, 16)
    _agree(getattr(tfft, name)(x), getattr(torch.fft, name)(x))


@pytest.mark.parametrize("name,kw", [
    ("fftn", {}), ("ifftn", {"norm": "ortho"}),
    ("fftn", {"dim": (0, 2)}), ("rfftn", {}), ("ihfftn", {}),
    ("fftn", {"s": (4, 8, 8)}),
])
def test_nd(name, kw):
    x = torch.randn(4, 6, 8)
    _agree(getattr(tfft, name)(x, **kw), getattr(torch.fft, name)(x, **kw))


@pytest.mark.parametrize("name", ["irfft2", "irfftn", "hfft2", "hfftn"])
def test_nd_real_output(name):
    x = torch.randn(4, 6, 5, dtype=torch.complex64)
    _agree(getattr(tfft, name)(x), getattr(torch.fft, name)(x))


def test_dtype_promotion_matches_torch():
    for dt in (torch.float32, torch.float64, torch.int32, torch.bool):
        x = (torch.randn(8) > 0).to(dt) if dt is torch.bool else \
            torch.arange(8).to(dt)
        ours, ref = tfft.fft(x), torch.fft.fft(x)
        assert ours.dtype == ref.dtype
    # f64 class is preserved even though the engine computes at f32
    # (same rule as the scipy backend adapter).
    x = torch.randn(16, dtype=torch.float64)
    _agree(tfft.fft(x), torch.fft.fft(x), tol=1e-5)


def test_device_and_autograd_detach():
    x = torch.randn(16, requires_grad=True)
    y = tfft.fft(x)
    assert not y.requires_grad  # documented: inference-path adapter
    assert y.device == x.device


def test_helpers():
    x = torch.randn(4, 6)
    _agree(tfft.fftshift(x), torch.fft.fftshift(x))
    _agree(tfft.ifftshift(x, dim=1), torch.fft.ifftshift(x, dim=1))
    _agree(tfft.fftfreq(10, d=0.5), torch.fft.fftfreq(10, d=0.5))
    _agree(tfft.rfftfreq(9), torch.fft.rfftfreq(9))


def test_namespace_complete():
    ours = set(dir(tfft))
    theirs = {n for n in dir(torch.fft) if not n.startswith("_")
              and n not in ("torch", "Tensor", "common_args",
                            "factory_common_args")}
    assert theirs <= ours, theirs - ours


def test_half_precision_inputs_bridge():
    """bf16/f16 tensors must not crash the bridge; engine computes at f32
    and returns the f32 complex class."""
    for dt in (torch.bfloat16, torch.float16):
        x = torch.randn(16).to(dt)
        y = tfft.fft(x)
        assert y.dtype == torch.complex64
        ref = torch.fft.fft(x.to(torch.float32))
        _agree(y, ref, tol=5e-2)        # half-precision data representation
