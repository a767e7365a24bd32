"""Real-to-real transforms: FFTW's r2r layer (DCT/DST/DHT/halfcomplex).

The reference wrapper never exposes these, but its CPU engine does —
FFTW's public API plans eleven r2r kinds (``fftw-3.3.8/api/fftw3.h`` kind
enum; solvers in ``rdft/``: hc2hc, DHT via ``rdft/dht-*.c``, the REDFT/
RODFT family via ``reodft/``).  A complete replacement carries them.

Every kind reduces to the library's own complex FFT cores
(``ops/stockham.build_c2c_1d``) with O(n) pre/post passes — slices,
flips, static permutations and twiddle multiplies that XLA fuses, which
is the TPU-idiomatic form of FFTW's specialized r2r codelets:

* ``R2HC`` / ``HC2R`` — halfcomplex packing of the real DFT
  (``rdft/rdft.h`` R2HC format): ``[r0 .. r_{n/2}, i_{ceil(n/2)-1} .. i_1]``.
* ``DHT`` — cas-kernel Hartley transform: ``Re(F) - Im(F)`` + Hermitian
  mirror (``rdft/dht-r2hc.c`` does the same reduction).
* ``REDFT10``/``REDFT01`` (DCT-II/III) — Makhoul's n-point even/odd
  reorder + quarter-wave twiddle, and its exact inverse via the
  Hermitian identity ``V[k] = (Y[k] - i Y[n-k]) e^{i pi k/2n} / 2``.
* ``REDFT00``/``RODFT00`` (DCT-I/DST-I) — symmetric extensions to
  2(n-1) / 2(n+1) points (FFTW's logical sizes for these kinds).
* ``REDFT11`` (DCT-IV) — half-shifted 2n-point transform with pre/post
  twiddles; ``RODFT10``/``RODFT01``/``RODFT11`` (DST-II/III/IV) via the
  sign-alternation identities mapping DST to DCT.

All kinds are unnormalized with FFTW's conventions (scipy.fft types 1-4
with ``norm=None`` agree); every formula is property-tested against
scipy and the textbook O(n^2) definitions in ``tests/test_r2r.py``.
"""
from __future__ import annotations

import math
from enum import IntEnum

import jax
import jax.numpy as jnp
import numpy as np

from ..dtypes import Direction
from . import factor as _factor
from .stockham import build_c2c_1d


class R2RKind(IntEnum):
    """FFTW r2r kinds, with FFTW's enum values (``api/fftw3.h``)."""
    R2HC = 0
    HC2R = 1
    DHT = 2
    REDFT00 = 3   # DCT-I
    REDFT01 = 4   # DCT-III
    REDFT10 = 5   # DCT-II
    REDFT11 = 6   # DCT-IV
    RODFT00 = 7   # DST-I
    RODFT01 = 8   # DST-III
    RODFT10 = 9   # DST-II
    RODFT11 = 10  # DST-IV


_DCT_TYPES = {1: R2RKind.REDFT00, 2: R2RKind.REDFT10,
              3: R2RKind.REDFT01, 4: R2RKind.REDFT11}
_DST_TYPES = {1: R2RKind.RODFT00, 2: R2RKind.RODFT10,
              3: R2RKind.RODFT01, 4: R2RKind.RODFT11}


def logical_size(n: int, kind: R2RKind) -> int:
    """FFTW's logical transform size for normalization/flops purposes
    (``fftw-3.3.8/api/plan-r2r.c`` N semantics): 2(n-1) for REDFT00,
    2(n+1) for RODFT00, 2n for the other trig kinds, n for R2HC/HC2R/DHT."""
    k = R2RKind(kind)
    if k == R2RKind.REDFT00:
        return 2 * (n - 1)
    if k == R2RKind.RODFT00:
        return 2 * (n + 1)
    if k in (R2RKind.R2HC, R2RKind.HC2R, R2RKind.DHT):
        return n
    return 2 * n


def _alt_signs(n: int):
    """f64 host table; cast to the traced dtype at use sites (``_tab``)."""
    return (-1.0) ** np.arange(n)


def _tab(np_table, like):
    """Constant-fold a host f64 table at the traced array's dtype — f32 on
    the TPU path, f64 when x64 is enabled (FFTW r2r is double by default;
    ``fftw-3.3.8/api/plan-r2r.c`` plans in the library's real type)."""
    return jnp.asarray(np_table, like.dtype)


def _fft_pair(n, direction, max_radix, precision, use_3m):
    """(B, n) split-complex FFT for the r2r reductions: the butterfly
    kernel on TPU for power-of-two last axes (same dispatch rule as the
    plan core; ~2.4x the einsum path at n=1024), einsum elsewhere."""
    import os
    if (jax.default_backend() == "tpu"
            and os.environ.get("REGENT_FFT_R2R_KERNEL", "1") != "0"
            and n >= 64 and (n & (n - 1)) == 0):
        from . import pallas_stockham as _ps
        if n <= _ps.MAX_LAST_N:
            def fn(zr, zi):
                return _ps.fft_axis_stockham(zr, zi, -1, direction)
            return fn
    return build_c2c_1d(n, direction, max_radix, precision, use_3m)


def _reorder_even_odd(x2):
    """(B, n) -> Makhoul's v = [x[0::2], reversed(x[1::2])]."""
    return jnp.concatenate(
        [x2[:, 0::2], jnp.flip(x2[:, 1::2], axis=1)], axis=1)


def _unreorder_perm(n: int) -> np.ndarray:
    """Static permutation p with x = v[:, p] inverting _reorder_even_odd."""
    r = np.concatenate([np.arange(0, n, 2), np.arange(1, n, 2)[::-1]])
    p = np.empty(n, dtype=np.int32)
    p[r] = np.arange(n, dtype=np.int32)
    return p


def build_r2r_1d(n: int, kind, max_radix: int = _factor.DEFAULT_MAX_RADIX,
                 precision=jax.lax.Precision.HIGHEST, use_3m: bool = False):
    """Build fn((B, n) real) -> (B, n) real for one FFTW r2r kind.

    Unnormalized FFTW semantics; each fn is jit-traceable and built on the
    library's own C2C cores (never ``jnp.fft``).
    """
    kind = R2RKind(kind)
    if n < 1:
        raise ValueError(f"r2r needs n >= 1, got {n}")
    if kind == R2RKind.REDFT00 and n < 2:
        raise ValueError("REDFT00 (DCT-I) needs n >= 2")
    h = n // 2 + 1

    if kind == R2RKind.R2HC:
        fwd = _fft_pair(n, Direction.FORWARD, max_radix, precision, use_3m)

        def fn(x2):
            yr, yi = fwd(x2, jnp.zeros_like(x2))
            return jnp.concatenate(
                [yr[:, :h], jnp.flip(yi[:, 1:(n + 1) // 2], axis=1)], axis=1)
        return fn

    if kind == R2RKind.HC2R:
        bwd = _fft_pair(n, Direction.BACKWARD, max_radix, precision, use_3m)
        # Reconstruct the full Hermitian spectrum from the halfcomplex
        # vector with two static-permutation gathers, then one backward
        # C2C; imag(result) == 0 by symmetry and is dropped.
        # S[k] = hc[min(k, n-k)] + i * sign * hc[pos]: the imag of a head
        # bin k < ceil(n/2) is stored at hc[n-k]; a tail bin's imag is
        # -i_{n-k}, stored at hc[k] itself; bins 0 (and n/2 for even n)
        # are purely real.
        k = np.arange(n)
        re_idx = np.minimum(k, n - k) % n
        head = (k >= 1) & (k < (n + 1) // 2)
        tail = k > n // 2
        im_idx = np.where(head, (n - k) % n, np.where(tail, k, 0))
        im_sign = head.astype(np.float64) - tail.astype(np.float64)

        def fn(x2):
            sr = jnp.take(x2, jnp.asarray(re_idx.astype(np.int32)), axis=1)
            si = jnp.take(x2, jnp.asarray(im_idx.astype(np.int32)), axis=1)
            si = si * _tab(im_sign, si)
            yr, _ = bwd(sr, si)
            return yr
        return fn

    if kind == R2RKind.DHT:
        fwd = _fft_pair(n, Direction.FORWARD, max_radix, precision, use_3m)
        # cas kernel: H[k] = Re F[k] - Im F[k] for the full spectrum.

        def fn(x2):
            yr, yi = fwd(x2, jnp.zeros_like(x2))
            return yr - yi
        return fn

    if kind == R2RKind.REDFT10:  # DCT-II
        fwd = _fft_pair(n, Direction.FORWARD, max_radix, precision, use_3m)
        th = np.pi * np.arange(n) / (2.0 * n)
        c2_np = 2.0 * np.cos(th)
        s2_np = 2.0 * np.sin(th)

        def fn(x2):
            v = _reorder_even_odd(x2)
            vr, vi = fwd(v, jnp.zeros_like(v))
            return _tab(c2_np, vr) * vr + _tab(s2_np, vi) * vi
        return fn

    if kind == R2RKind.REDFT01:  # DCT-III = unnormalized inverse of DCT-II
        bwd = _fft_pair(n, Direction.BACKWARD, max_radix, precision, use_3m)
        perm = jnp.asarray(_unreorder_perm(n))
        # V[0] = u[0]/2; V[k] = (u[k] - i u[n-k]) e^{i pi k/2n} / 2;
        # y = unreorder(Re(backward_fft(V)) * 2).  Fold the 1/2 and the
        # final *2 together (they cancel) into the twiddle tables.
        k = np.arange(n)
        th = np.pi * k / (2.0 * n)
        cr_np = np.cos(th); sr_np = np.sin(th)
        cr_np[0] = 1.0; sr_np[0] = 0.0
        flip_idx = jnp.asarray(((n - k) % n).astype(np.int32))
        not_first = (k != 0).astype(np.float64)

        def fn(x2):
            cw = _tab(cr_np, x2); sw = _tab(sr_np, x2)
            nf = _tab(not_first, x2)
            u_rev = jnp.take(x2, flip_idx, axis=1)      # u[(n-k) % n]
            u_rev = u_rev * nf                          # u[n-0] := 0
            # (u[k] - i u[n-k]) (cos + i sin) = (u cos + urev sin)
            #                                 + i (u sin - urev cos)
            vr = x2 * cw + u_rev * sw
            vi = x2 * sw - u_rev * cw
            vi = vi * nf                                # V[0] = u[0]
            yr, _ = bwd(vr, vi)
            return jnp.take(yr, perm, axis=1)
        return fn

    if kind == R2RKind.REDFT00:  # DCT-I over 2(n-1) points
        L = 2 * (n - 1)
        fwd = _fft_pair(L, Direction.FORWARD, max_radix, precision, use_3m)

        def fn(x2):
            v = jnp.concatenate([x2, jnp.flip(x2[:, 1:n - 1], axis=1)], axis=1)
            yr, _ = fwd(v, jnp.zeros_like(v))
            return yr[:, :n]
        return fn

    if kind == R2RKind.RODFT00:  # DST-I over 2(n+1) points
        L = 2 * (n + 1)
        fwd = _fft_pair(L, Direction.FORWARD, max_radix, precision, use_3m)

        def fn(x2):
            z = jnp.zeros((x2.shape[0], 1), x2.dtype)
            v = jnp.concatenate([z, x2, z, -jnp.flip(x2, axis=1)], axis=1)
            _, yi = fwd(v, jnp.zeros_like(v))
            return -yi[:, 1:n + 1]
        return fn

    if kind == R2RKind.REDFT11:  # DCT-IV via half-shifted 2n-point FFT
        L = 2 * n
        fwd = _fft_pair(L, Direction.FORWARD, max_radix, precision, use_3m)
        j = np.arange(n)
        pre = np.exp(-1j * np.pi * j / (2.0 * n))
        post = 2.0 * np.exp(-1j * np.pi * (2 * j + 1) / (4.0 * n))

        def fn(x2):
            zpad = jnp.zeros_like(x2)
            cr = jnp.concatenate([x2 * _tab(pre.real, x2), zpad], axis=1)
            ci = jnp.concatenate([x2 * _tab(pre.imag, x2), zpad], axis=1)
            gr, gi = fwd(cr, ci)
            return (_tab(post.real, gr) * gr[:, :n]
                    - _tab(post.imag, gi) * gi[:, :n])
        return fn

    # DST kinds II/III/IV via the sign-alternation DCT identities
    # (verified against scipy in tests): dst2(x) = rev(dct2(alt*x)),
    # dst3(x) = alt * dct3(rev(x)), dst4(x) = rev(dct4(alt*x)).
    if kind == R2RKind.RODFT10:
        base = build_r2r_1d(n, R2RKind.REDFT10, max_radix, precision, use_3m)
        alt = _alt_signs(n)
        return lambda x2: jnp.flip(base(x2 * _tab(alt, x2)), axis=1)
    if kind == R2RKind.RODFT01:
        base = build_r2r_1d(n, R2RKind.REDFT01, max_radix, precision, use_3m)
        alt = _alt_signs(n)
        return lambda x2: _tab(alt, x2) * base(jnp.flip(x2, axis=1))
    if kind == R2RKind.RODFT11:
        base = build_r2r_1d(n, R2RKind.REDFT11, max_radix, precision, use_3m)
        alt = _alt_signs(n)
        return lambda x2: jnp.flip(base(x2 * _tab(alt, x2)), axis=1)

    raise ValueError(f"unknown r2r kind: {kind!r}")


class R2RPlan:
    """Plan for an N-D real-to-real transform, one FFTW kind per axis.

    ``fftw_plan_r2r`` analog (``fftw-3.3.8/api/plan-r2r.c``): callable on
    real arrays of the planned shape; unnormalized FFTW semantics.
    """

    def __init__(self, shape, kinds, axes, max_radix, precision_name):
        from ..plan import _PRECISIONS
        self.shape = tuple(shape)
        self.axes = tuple(axes)
        self.kinds = tuple(R2RKind(k) for k in kinds)
        prec = _PRECISIONS[precision_name]
        fns = [(a, build_r2r_1d(self.shape[a], k, max_radix, prec))
               for a, k in zip(self.axes, self.kinds)]
        # flops by the libbench2 real-transform convention over logical
        # sizes (2.5 N log2 N, ``libbench2/mflops.c:26-27``).
        self.flops = 0.0
        for a, k in zip(self.axes, self.kinds):
            nl = logical_size(self.shape[a], k)
            self.flops += (2.5 * np.prod(self.shape) / self.shape[a]
                           * nl * max(1.0, math.log2(max(nl, 2))))

        def core(x):
            xr = x
            for a, fn in fns:
                ndim = xr.ndim
                ax = a % ndim
                moved = jnp.moveaxis(xr, ax, -1) if ax != ndim - 1 else xr
                lead = moved.shape[:-1]
                y2 = fn(moved.reshape(-1, moved.shape[-1]))
                y = y2.reshape(*lead, y2.shape[-1])
                xr = jnp.moveaxis(y, -1, ax) if ax != ndim - 1 else y
            return xr

        self._core = core  # unjitted (guru layer composes gather/scatter)
        self._exec = jax.jit(core)
        self._destroyed = False
        desc_kinds = ",".join(k.name for k in self.kinds)
        self.description = (f"(plan-r2r shape={self.shape} axes={self.axes} "
                            f"kinds=[{desc_kinds}] unnormalized)")

    def __call__(self, x):
        """Execute on a real array.  Compute follows the input dtype:
        float32 on the TPU-native path, float64 when x64 is enabled
        (FFTW's double-precision r2r); without x64, float64 input is
        downcast by ``jnp.asarray`` like everywhere else in the API."""
        if self._destroyed:
            raise RuntimeError("plan was destroyed")
        x = jnp.asarray(x)
        if x.dtype not in (jnp.float32, jnp.float64):
            raise TypeError(f"r2r plans take real input, got {x.dtype}")
        if x.shape != self.shape:
            raise ValueError(f"input shape {x.shape} != planned {self.shape}")
        return self._exec(x)

    execute = __call__

    def print_plan(self):
        print(self.description)

    def destroy(self):
        self._destroyed = True
        self._exec = None


# Plan cache: one-shot helpers (r2r/dct/dst/dht) reuse compiled plans —
# without it every repeated call re-traces and re-jits (~100-1000x the
# cached cost); the wisdom analog of plan.py's _PLAN_CACHE.
_R2R_CACHE: dict = {}


def plan_r2r(shape, kinds, axes=None, max_radix: int = _factor.DEFAULT_MAX_RADIX,
             precision: str = "highest") -> R2RPlan:
    """Plan an N-D r2r transform (``fftw_plan_r2r`` analog).

    ``kinds``: one :class:`R2RKind` (applied to every transformed axis)
    or a sequence with one kind per axis.  ``axes`` defaults to all axes.
    Plans are cached per (shape, kinds, axes, max_radix, precision);
    ``destroy()`` evicts from the cache.
    """
    shape = tuple(shape)
    if axes is None:
        axes = tuple(range(len(shape)))
    axes = tuple(a % len(shape) for a in axes)
    if isinstance(kinds, (int, R2RKind)):
        kinds = (R2RKind(kinds),) * len(axes)
    kinds = tuple(R2RKind(k) for k in kinds)
    if len(kinds) != len(axes):
        raise ValueError(f"{len(kinds)} kinds for {len(axes)} axes")
    key = (shape, kinds, axes, int(max_radix), precision)
    hit = _R2R_CACHE.get(key)
    if hit is not None and not hit._destroyed:
        return hit
    plan = R2RPlan(shape, kinds, axes, max_radix, precision)
    _R2R_CACHE[key] = plan
    return plan


def r2r(x, kind, axis: int = -1):
    """One-shot 1-D r2r transform along ``axis`` (unnormalized FFTW
    semantics); plans are cached across calls."""
    x = jnp.asarray(x)
    plan = plan_r2r(x.shape, (R2RKind(kind),), axes=(axis,))
    return plan(x)


# ---------------------------------------------------------------------------
# scipy.fft-parity one-shots
#
# Full scipy signatures: ``n``/``s`` crop-or-zero-pad, ``norm`` in
# {"backward" (None), "ortho", "forward"}, and ``orthogonalize`` (scipy's
# sqrt(2) endpoint adjustments that make the "ortho" matrices orthonormal).
# The kinds themselves stay FFTW-unnormalized (``r2r``/``plan_r2r`` above);
# everything here is diagonal pre/post scaling, which commutes across axes,
# so the N-D forms still execute as ONE multi-axis plan.
#
# FFTW pairs inverse kinds as REDFT10<->REDFT01 etc. (fftw-3.3.8/doc "Real
# even/odd DFTs"); types 1 and 4 are their own inverse kind.  scipy's
# idct/idst include the 1/logical-size factor under norm="backward".
# ---------------------------------------------------------------------------
_INV_TYPE = {1: 1, 2: 3, 3: 2, 4: 4}
_SQRT2 = math.sqrt(2.0)
# scipy's orthogonalize endpoint adjustments, per EXECUTED (family, type):
# entries listed get *sqrt(2) on input (PRE) / /sqrt(2) on output (POST).
# DCT-IV, DST-I and DST-IV are already orthogonal up to scale (no entry).
_ORTHO_PRE = {("dct", 1): (0, -1), ("dct", 3): (0,), ("dst", 3): (-1,)}
_ORTHO_POST = {("dct", 1): (0, -1), ("dct", 2): (0,), ("dst", 2): (-1,)}


def _resize_axis(x, n, axis):
    """Crop or zero-pad ``x`` along ``axis`` to length ``n`` (scipy's
    ``n``/``s`` semantics)."""
    n = int(n)
    if n < 1:
        raise ValueError(f"invalid number of data points ({n}) specified")
    cur = x.shape[axis]
    if n == cur:
        return x
    if n < cur:
        return jax.lax.slice_in_dim(x, 0, n, axis=axis)
    pad = [(0, 0)] * x.ndim
    pad[axis % x.ndim] = (0, n - cur)
    return jnp.pad(x, pad)


def _entry_scaled(x, axis, idx, factor):
    """Multiply the ``idx`` hyperplane along ``axis`` by ``factor``."""
    sl = [slice(None)] * x.ndim
    sl[axis] = idx % x.shape[axis]
    return x.at[tuple(sl)].multiply(jnp.asarray(factor, x.dtype))


def _norm_scale(norm, logical_n: int, inverse: bool) -> float:
    if norm in (None, "backward"):
        return 1.0 / logical_n if inverse else 1.0
    if norm == "ortho":
        return 1.0 / math.sqrt(logical_n)
    if norm == "forward":
        return 1.0 if inverse else 1.0 / logical_n
    raise ValueError(f"Invalid norm value {norm!r}; should be 'backward', "
                     "'ortho' or 'forward'")


def _scipy_r2r(x, family: str, typ: int, s, axes, norm, orthogonalize,
               inverse: bool):
    """Shared worker for the dct/dst/dctn/dstn one-shot family."""
    tables = _DCT_TYPES if family == "dct" else _DST_TYPES
    if typ not in tables:
        raise ValueError(f"{family.upper()} type must be 1-4, got {typ}")
    if norm not in (None, "backward", "ortho", "forward"):
        raise ValueError(f"Invalid norm value {norm!r}; should be "
                         "'backward', 'ortho' or 'forward'")
    if orthogonalize is None:
        orthogonalize = norm == "ortho"
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        raise TypeError(f"{family} transforms take real input, got {x.dtype}")
    if not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(jnp.float32)  # scipy promotes integer input
    if isinstance(axes, int):
        axes = (axes,)
    if s is not None and np.ndim(s) == 0:
        s = (int(s),)
    if s is not None and axes is None:
        axes = tuple(range(x.ndim - len(s), x.ndim))
    if axes is None:
        axes = tuple(range(x.ndim))
    axes = tuple(a % x.ndim for a in axes)
    if len(set(axes)) != len(axes):
        raise ValueError("all axes must be unique")
    if s is not None:
        if len(s) != len(axes):
            raise ValueError("when given, axes and shape arguments"
                             " have to be of the same length")
        for a, m in zip(axes, s):
            if m is not None and int(m) != -1:
                x = _resize_axis(x, m, a)

    exec_typ = _INV_TYPE[typ] if inverse else typ
    kind = tables[exec_typ]
    scale = 1.0
    for a in axes:
        scale *= _norm_scale(norm, logical_size(x.shape[a], kind), inverse)
    if orthogonalize:
        for a in axes:
            for i in _ORTHO_PRE.get((family, exec_typ), ()):
                x = _entry_scaled(x, a, i, _SQRT2)
    y = plan_r2r(x.shape, kind, axes=axes)(x)
    if orthogonalize:
        for a in axes:
            for i in _ORTHO_POST.get((family, exec_typ), ()):
                y = _entry_scaled(y, a, i, 1.0 / _SQRT2)
    if scale != 1.0:
        y = y * jnp.asarray(scale, y.dtype)
    return y


def dct(x, type: int = 2, n=None, axis: int = -1, norm=None,
        overwrite_x=False, workers=None, orthogonalize=None):
    """DCT types 1-4 with full scipy.fft.dct semantics (``n`` crop/pad,
    ``norm``, ``orthogonalize``); compute follows the input dtype (f32 on
    the TPU path, f64 under x64) on the framework's own r2r kinds.
    ``overwrite_x``/``workers`` accepted for drop-in compatibility
    (meaningless under XLA)."""
    return _scipy_r2r(x, "dct", type, None if n is None else (n,), (axis,),
                      norm, orthogonalize, inverse=False)


def idct(x, type: int = 2, n=None, axis: int = -1, norm=None,
         overwrite_x=False, workers=None, orthogonalize=None):
    """Inverse DCT (scipy.fft.idct semantics: idct(dct(x, **kw), **kw) ==
    x for every norm)."""
    return _scipy_r2r(x, "dct", type, None if n is None else (n,), (axis,),
                      norm, orthogonalize, inverse=True)


def dst(x, type: int = 2, n=None, axis: int = -1, norm=None,
        overwrite_x=False, workers=None, orthogonalize=None):
    """DST types 1-4 with full scipy.fft.dst semantics."""
    return _scipy_r2r(x, "dst", type, None if n is None else (n,), (axis,),
                      norm, orthogonalize, inverse=False)


def idst(x, type: int = 2, n=None, axis: int = -1, norm=None,
         overwrite_x=False, workers=None, orthogonalize=None):
    """Inverse DST (scipy.fft.idst semantics)."""
    return _scipy_r2r(x, "dst", type, None if n is None else (n,), (axis,),
                      norm, orthogonalize, inverse=True)


def dctn(x, type: int = 2, s=None, axes=None, norm=None, overwrite_x=False,
         workers=None, orthogonalize=None):
    """N-D DCT over ``axes`` (scipy.fft.dctn semantics); executes as ONE
    multi-axis r2r plan (``fftw_plan_r2r`` analog)."""
    return _scipy_r2r(x, "dct", type, s, axes, norm, orthogonalize,
                      inverse=False)


def idctn(x, type: int = 2, s=None, axes=None, norm=None, overwrite_x=False,
          workers=None, orthogonalize=None):
    """N-D inverse DCT (scipy.fft.idctn): idctn(dctn(x)) == x."""
    return _scipy_r2r(x, "dct", type, s, axes, norm, orthogonalize,
                      inverse=True)


def dstn(x, type: int = 2, s=None, axes=None, norm=None, overwrite_x=False,
         workers=None, orthogonalize=None):
    """N-D DST over ``axes`` (scipy.fft.dstn semantics)."""
    return _scipy_r2r(x, "dst", type, s, axes, norm, orthogonalize,
                      inverse=False)


def idstn(x, type: int = 2, s=None, axes=None, norm=None, overwrite_x=False,
          workers=None, orthogonalize=None):
    """N-D inverse DST (scipy.fft.idstn): idstn(dstn(x)) == x."""
    return _scipy_r2r(x, "dst", type, s, axes, norm, orthogonalize,
                      inverse=True)


def dht(x, axis: int = -1):
    """Discrete Hartley transform (FFTW_DHT, unnormalized)."""
    return r2r(x, R2RKind.DHT, axis)


def idht(x, axis: int = -1):
    """Inverse DHT: DHT is its own inverse up to n, so idht(dht(x)) == x
    (the 1/n factor applied here, mirroring scipy-style inverses)."""
    x = jnp.asarray(x)
    n = x.shape[axis]
    y = r2r(x, R2RKind.DHT, axis)
    return y / jnp.asarray(n, y.dtype)
