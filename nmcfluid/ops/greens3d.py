"""3D ball Green's functions (harmonic and Yukawa/screened) for walk-on-stars.

Re-derivation of zombie's `HarmonicGreensFnBall<3>` / `YukawaGreensFnBall<3>`
(reference: bindings/zombie/include/zombie/core/distributions.h:477-561,
698-832). The 3D screened kernels are elementary (exp/sinh); we use the
exponentially-scaled forms

    sh_e(z) = e^{-z} sinh z = (1 - e^{-2z})/2
    K32e(z) = e^{z} K_{3/2}-type term = 1 + 1/z
    I32e(z) = e^{-z} I_{3/2}-type term = ch_e(z) - sh_e(z)/z

so nothing overflows in float32 for large sqrt(lam)*R.
"""
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

FOUR_PI = 4.0 * jnp.pi
R_CLAMP = 1e-4


def _sh_e(z):
    return (1.0 - jnp.exp(-2.0 * z)) / 2.0


def _ch_e(z):
    return (1.0 + jnp.exp(-2.0 * z)) / 2.0


def _k32e(z):
    return 1.0 + 1.0 / z


def _i32e(z):
    return _ch_e(z) - _sh_e(z) / z


class Ball(NamedTuple):
    R: jax.Array
    Z: jax.Array
    sh_e_R: jax.Array
    k32e_R: jax.Array
    i32e_R: jax.Array


class Harmonic3D:
    """G(r) = (1/r - 1/R)/4pi on a ball (distributions.h:477-561)."""
    dim = 3
    screened = False

    @staticmethod
    def make_ball(R, sqrt_lam=None):
        z = jnp.zeros_like(R)
        return Ball(R=R, Z=z, sh_e_R=z, k32e_R=z, i32e_R=z)

    @staticmethod
    def eval(ball, r):
        return (1.0 / r - 1.0 / ball.R) / FOUR_PI

    @staticmethod
    def norm(ball):
        return ball.R * ball.R / 6.0

    @staticmethod
    def dspk(ball, r):
        return jnp.ones_like(r)

    @staticmethod
    def pk_over_uniform(ball):
        return jnp.ones_like(ball.R)

    @staticmethod
    def pk_grad_coeff(ball):
        # poissonKernelGradient = 3 d / (4pi R^2), d = ySurf - c
        return 3.0 / (FOUR_PI * ball.R * ball.R)

    @staticmethod
    def grad_norm(ball, r):
        return (1.0 / (r * r * r) - 1.0 / (ball.R ** 3)) / FOUR_PI

    @staticmethod
    def pk_grad_over_thr(ball):
        """See greens2d: the e^{-Z}-free quotient the estimator needs."""
        return 3.0 / (FOUR_PI * ball.R * ball.R)

    @staticmethod
    def grad_norm_over_eval(ball, r):
        r = jnp.clip(r, R_CLAMP, 0.999 * ball.R)
        num = 1.0 / (r ** 3) - 1.0 / (ball.R ** 3)
        den = jnp.maximum(1.0 / r - 1.0 / ball.R, 1e-12)
        return num / den

    @staticmethod
    def radial_pdf(ball, r):
        # [eval/norm] * 4 pi r^2 = 6 r (R - r) / R^3
        return 6.0 * r * (ball.R - r) / (ball.R ** 3)

    @staticmethod
    def sample_radius(ball, key, rounds: int = 0):
        """Ulrich's polar method, closed form (distributions.h:483-496)."""
        return Harmonic3D.sample_radius_u(
            ball, jax.random.uniform(key, ball.R.shape + (2,)))

    @staticmethod
    def sample_radius_u(ball, u2):
        phi = 2.0 * jnp.pi * u2[..., 1]
        r = (1.0 + jnp.sqrt(jnp.maximum(0.0, 1.0 - jnp.cbrt(
            u2[..., 0] ** 2))) * jnp.cos(phi)) * ball.R / 2.0
        r = jnp.maximum(r, R_CLAMP)
        r = jnp.where(r > ball.R, ball.R / 2.0, r)
        return r, Harmonic3D.eval(ball, r)


class Yukawa3D:
    dim = 3
    screened = True

    def __init__(self, lam):
        self.lam = float(lam)
        self.sqrt_lam = math.sqrt(float(lam))
        from . import radial_tables as rt
        # numpy (trace-safe), raw: draws use the gather-free matmul form
        self._table = rt.build_table(3).astype("float32")

    def make_ball(self, R):
        Z = self.sqrt_lam * R
        return Ball(R=R, Z=Z, sh_e_R=_sh_e(Z), k32e_R=_k32e(Z),
                    i32e_R=_i32e(Z))

    def _cross(self, ball, z):
        return jnp.exp(2.0 * (z - ball.Z))

    def eval(self, ball, r):
        # (e^{-z} - e^{-Z} sinh z / sinh Z)/(4 pi r)
        z = self.sqrt_lam * r
        q = 1.0 - (_sh_e(z) / ball.sh_e_R) * self._cross(ball, z)
        return jnp.exp(-z) * q / (FOUR_PI * r)

    def norm(self, ball):
        # (1 - 4pi*poissonKernel)/lam, poissonKernel = Z/(4pi sinh Z)
        return (1.0 - ball.Z * jnp.exp(-ball.Z) / ball.sh_e_R) / self.lam

    def dspk(self, ball, r):
        r = jnp.maximum(r, R_CLAMP)
        z = self.sqrt_lam * r
        q = _k32e(z) + _i32e(z) * self._cross(ball, z) / ball.sh_e_R
        return z * jnp.exp(-z) * q

    def pk_over_uniform(self, ball):
        return ball.Z * jnp.exp(-ball.Z) / ball.sh_e_R

    def pk_grad_coeff(self, ball):
        # poissonKernelGradient = d * lam/(4pi I32(Z))
        return self.lam * jnp.exp(-ball.Z) / (FOUR_PI * ball.i32e_R)

    def grad_norm(self, ball, r):
        z = self.sqrt_lam * r
        q = _k32e(z) - _i32e(z) * (ball.k32e_R / ball.i32e_R) * self._cross(ball, z)
        return self.sqrt_lam * jnp.exp(-z) * q / (FOUR_PI * r * r)

    def pk_grad_over_thr(self, ball):
        """[lam e^{-Z}/(4pi I32)] / [Z e^{-Z}/sh] with e^{-Z} cancelled:
        sqrt(lam) sh_e(Z) / (4pi R i32e(Z)). Bounded for all Z."""
        return self.sqrt_lam * ball.sh_e_R \
            / (FOUR_PI * ball.R * ball.i32e_R)

    def grad_norm_over_eval(self, ball, r):
        """sqrt(lam) q1/(r q0), e^{-z}-free (see greens2d)."""
        r = jnp.clip(r, R_CLAMP, 0.999 * ball.R)
        z = self.sqrt_lam * r
        c = self._cross(ball, z)
        q0 = 1.0 - (_sh_e(z) / ball.sh_e_R) * c
        q1 = _k32e(z) - _i32e(z) * (ball.k32e_R / ball.i32e_R) * c
        return self.sqrt_lam * q1 / (r * jnp.maximum(q0, 1e-10))

    def radial_pdf(self, ball, r):
        return self.eval(ball, r) * FOUR_PI * r * r / self.norm(ball)

    def rejection_bound(self, ball):
        # distributions.h:721-723
        R, lam, slam = ball.R, self.lam, self.sqrt_lam
        sR = jnp.sqrt(R)
        lo = jnp.where(R <= lam,
                       jnp.maximum(2.0 / R, 2.0 / lam),
                       jnp.minimum(2.0 / R, 2.0 / lam))
        hi = jnp.where(R <= lam,
                       jnp.maximum(0.5 * sR, 0.5 * slam),
                       jnp.minimum(0.5 * sR, 0.5 * slam))
        return jnp.maximum(lo, hi)

    def sample_radius(self, ball, key, rounds: int = 0):
        """Inverse-CDF draw (see greens2d.Yukawa2D.sample_radius)."""
        return self.sample_radius_u(
            ball, jax.random.uniform(key, ball.R.shape + (2,)))

    def sample_radius_u(self, ball, u2):
        from . import radial_tables as rt
        t = rt.sample_t_screened_u_mm(self._table, ball.Z, u2[..., 0])
        r = jnp.clip(t * ball.R, R_CLAMP, ball.R)
        return r, self.eval(ball, r)
