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
        # zero-dim (padded) anchors: sqrt(dxa²+dya²) has a NaN gradient at 0
        # and exp()*0 collapses boxes; clip like encode (no effect on real
        # anchors, whose dims are far above 1e-5)
        dxa = jnp.clip(dxa, 1e-5, None)
        dya = jnp.clip(dya, 1e-5, None)
        dza = jnp.clip(dza, 1e-5, None)
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


class PreviousResidualDecoder:
    """Legacy decoder with w/l/h encoding order (ref: box_coder_utils.py:78-107).

    Old-checkpoint compatibility: encodings are (x, y, z, w, l, h, r) where
    w scales dxa via exp(l_t)... matching the reference's mapping
    dxg = exp(lt) * dxa, dyg = exp(wt) * dya (note the w/l swap).
    """

    def __init__(self, code_size=7, **kwargs):
        self.code_size = code_size

    @staticmethod
    def decode(box_encodings, anchors):
        xa, ya, za, dxa, dya, dza, ra = jnp.split(anchors[..., :7], 7, axis=-1)
        xt, yt, zt, wt, lt, ht, rt = jnp.split(box_encodings[..., :7], 7, axis=-1)
        cas = [anchors[..., 7 + i : 8 + i]
               for i in range(anchors.shape[-1] - 7)]
        cts = [box_encodings[..., 7 + i : 8 + i]
               for i in range(box_encodings.shape[-1] - 7)]

        diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
        xg = xt * diagonal + xa
        yg = yt * diagonal + ya
        zg = zt * dza + za
        dxg = jnp.exp(lt) * dxa
        dyg = jnp.exp(wt) * dya
        dzg = jnp.exp(ht) * dza
        rg = rt + ra
        cgs = [t + a for t, a in zip(cts, cas)]
        return jnp.concatenate([xg, yg, zg, dxg, dyg, dzg, rg, *cgs], axis=-1)


class PreviousResidualRoIDecoder:
    """Legacy RoI decoder: heading decodes as ra - rt (ref: :110-141)."""

    def __init__(self, code_size=7, **kwargs):
        self.code_size = code_size

    @staticmethod
    def decode(box_encodings, anchors):
        out = PreviousResidualDecoder.decode(box_encodings, anchors)
        ra = anchors[..., 6:7]
        rt = box_encodings[..., 6:7]
        return jnp.concatenate([out[..., :6], ra - rt, out[..., 7:]], axis=-1)


class PointResidualCoder:
    """Point-anchored coder with sin/cos heading (ref: box_coder_utils.py:144-222).

    Encodes GT boxes relative to per-point "anchors" whose dims come from a
    per-class mean-size table (``use_mean_size``) or are absolute logs.
    """

    def __init__(self, code_size=8, use_mean_size=True, mean_size=None, **kwargs):
        self.code_size = code_size
        self.use_mean_size = use_mean_size
        if use_mean_size:
            self.mean_size = jnp.asarray(mean_size, jnp.float32)
            assert float(self.mean_size.min()) > 0

    def encode(self, gt_boxes, points, gt_classes=None):
        """(N, 7+C) x (N, 3) [+ (N,) classes in [1, K]] → (N, 8+C)."""
        g = gt_boxes.at[..., 3:6].set(jnp.clip(gt_boxes[..., 3:6], 1e-5))
        xg, yg, zg = g[..., 0:1], g[..., 1:2], g[..., 2:3]
        dxg, dyg, dzg = g[..., 3:4], g[..., 4:5], g[..., 5:6]
        rg = g[..., 6:7]
        cgs = g[..., 7:]
        xa, ya, za = points[..., 0:1], points[..., 1:2], points[..., 2:3]
        if self.use_mean_size:
            sz = self.mean_size[jnp.clip(gt_classes - 1, 0)]
            dxa, dya, dza = sz[..., 0:1], sz[..., 1:2], sz[..., 2:3]
            diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
            xt = (xg - xa) / diagonal
            yt = (yg - ya) / diagonal
            zt = (zg - za) / dza
            dxt = jnp.log(dxg / dxa)
            dyt = jnp.log(dyg / dya)
            dzt = jnp.log(dzg / dza)
        else:
            xt, yt, zt = xg - xa, yg - ya, zg - za
            dxt, dyt, dzt = jnp.log(dxg), jnp.log(dyg), jnp.log(dzg)
        return jnp.concatenate(
            [xt, yt, zt, dxt, dyt, dzt, jnp.cos(rg), jnp.sin(rg), cgs], axis=-1)

    def decode(self, box_encodings, points, pred_classes=None):
        """(N, 8+C) x (N, 3) [+ (N,) classes] → (N, 7+C)."""
        e = box_encodings
        xt, yt, zt = e[..., 0:1], e[..., 1:2], e[..., 2:3]
        dxt, dyt, dzt = e[..., 3:4], e[..., 4:5], e[..., 5:6]
        cost, sint = e[..., 6:7], e[..., 7:8]
        cts = e[..., 8:]
        xa, ya, za = points[..., 0:1], points[..., 1:2], points[..., 2:3]
        if self.use_mean_size:
            sz = self.mean_size[jnp.clip(pred_classes - 1, 0)]
            dxa, dya, dza = sz[..., 0:1], sz[..., 1:2], sz[..., 2:3]
            diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
            xg = xt * diagonal + xa
            yg = yt * diagonal + ya
            zg = zt * dza + za
            dxg = jnp.exp(dxt) * dxa
            dyg = jnp.exp(dyt) * dya
            dzg = jnp.exp(dzt) * dza
        else:
            xg, yg, zg = xt + xa, yt + ya, zt + za
            dxg, dyg, dzg = jnp.exp(dxt), jnp.exp(dyt), jnp.exp(dzt)
        rg = jnp.arctan2(sint, cost)
        return jnp.concatenate([xg, yg, zg, dxg, dyg, dzg, rg, cts], axis=-1)
