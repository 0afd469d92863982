"""Box coders (ref: pcdet/utils/box_coder_utils.py:5-222), pure jnp."""

from __future__ import annotations

import jax.numpy as jnp


class ResidualCoder:
    """Anchor-delta coder with log-dims (ref: box_coder_utils.py:5-77)."""

    def __init__(self, code_size=7, encode_angle_by_sincos=False):
        self.code_size = code_size
        self.encode_angle_by_sincos = encode_angle_by_sincos
        if self.encode_angle_by_sincos:
            self.code_size += 1

    def encode(self, boxes, anchors):
        """boxes/anchors (..., 7+) → (..., code_size)."""
        xa, ya, za, dxa, dya, dza, ra = jnp.split(anchors[..., :7], 7, axis=-1)
        xg, yg, zg, dxg, dyg, dzg, rg = jnp.split(boxes[..., :7], 7, axis=-1)
        dxa = jnp.clip(dxa, 1e-5, None)
        dya = jnp.clip(dya, 1e-5, None)
        dza = jnp.clip(dza, 1e-5, None)
        dxg = jnp.clip(dxg, 1e-5, None)
        dyg = jnp.clip(dyg, 1e-5, None)
        dzg = jnp.clip(dzg, 1e-5, None)

        diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
        xt = (xg - xa) / diagonal
        yt = (yg - ya) / diagonal
        zt = (zg - za) / dza
        dxt = jnp.log(dxg / dxa)
        dyt = jnp.log(dyg / dya)
        dzt = jnp.log(dzg / dza)
        if self.encode_angle_by_sincos:
            rt = [jnp.cos(rg) - jnp.cos(ra), jnp.sin(rg) - jnp.sin(ra)]
        else:
            rt = [rg - ra]
        extras = [boxes[..., 7 + i : 8 + i] - anchors[..., 7 + i : 8 + i]
                  for i in range(boxes.shape[-1] - 7)]
        return jnp.concatenate([xt, yt, zt, dxt, dyt, dzt, *rt, *extras], axis=-1)

    def decode(self, encodings, anchors):
        xa, ya, za, dxa, dya, dza, ra = jnp.split(anchors[..., :7], 7, axis=-1)
        if self.encode_angle_by_sincos:
            xt, yt, zt, dxt, dyt, dzt = jnp.split(encodings[..., :6], 6, axis=-1)
            cost = encodings[..., 6:7]
            sint = encodings[..., 7:8]
            extras = encodings[..., 8:]
        else:
            xt, yt, zt, dxt, dyt, dzt, rt = jnp.split(encodings[..., :7], 7, axis=-1)
            extras = encodings[..., 7:]

        diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
        xg = xt * diagonal + xa
        yg = yt * diagonal + ya
        zg = zt * dza + za
        dxg = jnp.exp(jnp.clip(dxt, -8, 8)) * dxa
        dyg = jnp.exp(jnp.clip(dyt, -8, 8)) * dya
        dzg = jnp.exp(jnp.clip(dzt, -8, 8)) * dza
        if self.encode_angle_by_sincos:
            rg = jnp.arctan2(sint + jnp.sin(ra), cost + jnp.cos(ra))
        else:
            rg = rt + ra
        extra_list = [extras[..., i : i + 1] + anchors[..., 7 + i : 8 + i]
                      for i in range(extras.shape[-1])]
        return jnp.concatenate([xg, yg, zg, dxg, dyg, dzg, rg, *extra_list], axis=-1)
