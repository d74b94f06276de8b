"""Box coders (reference detector3d/pcdet/utils/box_coder_utils.py:5-79)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


class ResidualCoder:
    """xyz/diag-normalized residuals + log dim ratios + angle residual."""

    def __init__(self, code_size: int = 7, encode_angle_by_sincos: bool = False, **kw):
        self.code_size = code_size + (1 if encode_angle_by_sincos else 0)
        self.encode_angle_by_sincos = encode_angle_by_sincos

    def encode(self, boxes: jax.Array, anchors: jax.Array) -> jax.Array:
        """boxes (..., 7+C) gt, anchors (..., 7+C) -> (..., code_size)."""
        anchors = anchors.at[..., 3:6].set(jnp.maximum(anchors[..., 3:6], 1e-5))
        boxes = boxes.at[..., 3:6].set(jnp.maximum(boxes[..., 3:6], 1e-5))

        xa, ya, za, dxa, dya, dza, ra = (anchors[..., i] for i in range(7))
        xg, yg, zg, dxg, dyg, dzg, rg = (boxes[..., i] for i in range(7))
        diag = jnp.sqrt(dxa ** 2 + dya ** 2)
        out = [
            (xg - xa) / diag, (yg - ya) / diag, (zg - za) / dza,
            jnp.log(dxg / dxa), jnp.log(dyg / dya), jnp.log(dzg / dza),
        ]
        if self.encode_angle_by_sincos:
            out += [jnp.cos(rg) - jnp.cos(ra), jnp.sin(rg) - jnp.sin(ra)]
        else:
            out += [rg - ra]
        out += [boxes[..., 7 + i] - anchors[..., 7 + i]
                for i in range(boxes.shape[-1] - 7)]
        return jnp.stack(out, axis=-1)

    def decode(self, encodings: jax.Array, anchors: jax.Array) -> jax.Array:
        xa, ya, za, dxa, dya, dza, ra = (anchors[..., i] for i in range(7))
        if self.encode_angle_by_sincos:
            xt, yt, zt, dxt, dyt, dzt, cost, sint = (encodings[..., i] for i in range(8))
        else:
            xt, yt, zt, dxt, dyt, dzt, rt = (encodings[..., i] for i in range(7))
        diag = jnp.sqrt(dxa ** 2 + dya ** 2)
        xg = xt * diag + xa
        yg = yt * diag + ya
        zg = zt * dza + za
        dxg = jnp.exp(dxt) * dxa
        dyg = jnp.exp(dyt) * dya
        dzg = jnp.exp(dzt) * dza
        if self.encode_angle_by_sincos:
            rg = jnp.arctan2(sint + jnp.sin(ra), cost + jnp.cos(ra))
        else:
            rg = rt + ra
        rest = [encodings[..., self.code_size + i] + anchors[..., 7 + i]
                for i in range(anchors.shape[-1] - 7)]
        return jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg, *rest], axis=-1)


BOX_CODERS = {"ResidualCoder": ResidualCoder}


def build_box_coder(name: str, **kw):
    return BOX_CODERS[name](**kw)
