"""Training utilities: optimize gaussian parameters against target images.

The reference core is a storage/dispatch layer with no training loop; this
is the renderer extension's training surface (BASELINE.json north star:
"full differentiable render fwd+bwd"). Parameters are kept in an
unconstrained space (log-scales, logit opacity, unnormalized quats) so
plain gradient steps stay feasible, mirroring how the original 3DGS trains.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..models.gaussian import GaussianSoA
from ..ops.transforms import cov3d_from_rot_scale
from .camera import Camera
from .renderer import render


class TrainableGaussians(NamedTuple):
    """Unconstrained parameter pytree for optimization."""

    means: jnp.ndarray  # [N, 3]
    quats: jnp.ndarray  # [N, 4] unnormalized
    log_scales: jnp.ndarray  # [N, 3]
    color_logit: jnp.ndarray  # [N, 3] sigmoid -> base color
    opacity_logit: jnp.ndarray  # [N] sigmoid -> opacity
    sh: jnp.ndarray  # [N, 15, 3]

    @classmethod
    def from_soa(cls, soa: GaussianSoA) -> "TrainableGaussians":
        color = jnp.clip(
            jnp.asarray(soa.color, jnp.float32) / 255.0, 1e-4, 1 - 1e-4
        )
        return cls(
            means=jnp.asarray(soa.pos),
            quats=jnp.asarray(soa.rot),
            log_scales=jnp.log(jnp.asarray(soa.scale)),
            color_logit=jax.scipy.special.logit(color[:, 0:3]),
            opacity_logit=jax.scipy.special.logit(color[:, 3]),
            sh=jnp.asarray(soa.sh),
        )

    def constrained(self):
        """(means, cov3d6, base_color, opacity, sh) for render()."""
        quats = self.quats / jnp.linalg.norm(
            self.quats, axis=-1, keepdims=True
        ).clip(1e-8)
        cov6 = cov3d_from_rot_scale(quats, jnp.exp(self.log_scales))
        return (
            self.means,
            cov6,
            jax.nn.sigmoid(self.color_logit),
            jax.nn.sigmoid(self.opacity_logit),
            self.sh,
        )

    def to_soa(self) -> GaussianSoA:
        import numpy as np

        means, _, color, opacity, sh = self.constrained()
        quats = self.quats / jnp.linalg.norm(
            self.quats, axis=-1, keepdims=True
        ).clip(1e-8)
        rgba = jnp.concatenate([color, opacity[:, None]], axis=-1)
        return GaussianSoA(
            rot=np.asarray(quats),
            pos=np.asarray(means),
            color=np.asarray(jnp.clip(rgba * 255.0, 0, 255)).astype("uint8"),
            sh=np.asarray(sh),
            scale=np.asarray(jnp.exp(self.log_scales)),
        )


def l2_image_loss(image: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((image - target) ** 2)


def make_train_step(
    camera: Camera,
    target: jnp.ndarray,
    optimizer: optax.GradientTransformation,
    sh_deg: int = 3,
    background: tuple = (0.0, 0.0, 0.0),
    loss_fn=l2_image_loss,
    **render_kw: Any,
):
    """Jitted (params, opt_state) -> (params, opt_state, loss, overflow).

    ``overflow`` is the renderer's fragment-capacity flag. When it fires,
    the custom vjp zeroes the attribute-table gradient (the truncated
    stream no longer lines up with the analytic segment offsets), so the
    step trains on *nothing* — callers must raise ``max_fragments``, not
    ignore the flag. :func:`fit` surfaces it as a warning.
    """

    def loss_of(params: TrainableGaussians):
        means, cov6, color, opacity, sh = params.constrained()
        res = render(
            means, cov6, color, opacity, camera, sh=sh, sh_deg=sh_deg,
            background=background, **render_kw,
        )
        return loss_fn(res.image, target), res.overflow

    @jax.jit
    def step(params, opt_state):
        (loss, overflow), grads = jax.value_and_grad(
            loss_of, has_aux=True
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, overflow

    return step


def fit(
    initial: GaussianSoA,
    camera: Camera,
    target: jnp.ndarray,
    steps: int = 200,
    learning_rate: float = 5e-3,
    optimizer: Optional[optax.GradientTransformation] = None,
    log_every: int = 0,
    **kw: Any,
) -> tuple[GaussianSoA, list[float]]:
    """Fit a scene to one target image. Returns (fitted scene, loss curve).

    Unless ``max_fragments`` is passed, the capacity is MEASURED from the
    initial scene (render/renderer.measure_max_fragments, 1.5x headroom
    for parameter drift) rather than the per-gaussian heuristic — the
    heuristic either overflows (the step then trains on nothing) or
    wastes fragment-scale cost.
    """
    params = TrainableGaussians.from_soa(initial)
    opt = optimizer or optax.adam(learning_rate)
    opt_state = opt.init(params)
    if "max_fragments" not in kw:
        from .renderer import measure_max_fragments, measure_max_rows

        means, cov6, _, opacity, _ = params.constrained()
        mkw = dict(
            headroom=1.5,
            size=kw.get("size", 1.0),
            max_std_dev=kw.get("max_std_dev", 3.0),
            antialiased=kw.get("antialiased", False),
        )
        kw["max_fragments"] = measure_max_fragments(
            means, cov6, opacity, camera, **mkw
        )
        kw.setdefault(
            "max_rows",
            measure_max_rows(means, cov6, opacity, camera, **mkw),
        )
    step = make_train_step(camera, jnp.asarray(target, jnp.float32), opt, **kw)

    # Curve contract: one entry per logged step (every ``log_every``-th
    # when > 0) plus always the final step; ``steps == 0`` returns an
    # empty curve.
    losses: list[float] = []
    warned = False
    for i in range(steps):
        params, opt_state, loss, overflow = step(params, opt_state)
        if (log_every and i % log_every == 0) or i == steps - 1:
            # Sync only on logged steps (float(loss) already materializes),
            # so the overflow check never serializes the async dispatch.
            losses.append(float(loss))
            if not warned and bool(overflow):
                import warnings

                warnings.warn(
                    "fragment capacity overflow: gradients are zeroed and "
                    "the overflowing steps optimized nothing — raise "
                    "max_fragments",
                    RuntimeWarning,
                    stacklevel=2,
                )
                warned = True
    return params.to_soa(), losses
