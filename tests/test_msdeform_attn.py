"""MSDeformAttention parity: with zero sampling offsets and uniform
attention weights, the output must equal
output_proj(mean over levels/points of value_proj(bilinear(value, ref))) —
checks the bilinear gather plumbing against a numpy reference computed
with the module's own initialized weights.
"""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

from oadg_tpu.models.dense_heads.deformable_detr_head import MSDeformAttention


def _bilinear_np(vmap, y, x):
    h, w, c = vmap.shape
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    acc = np.zeros(c, np.float32)
    for yi, xi, wt in [(y0, x0, (1 - (y - y0)) * (1 - (x - x0))),
                       (y0, x0 + 1, (1 - (y - y0)) * (x - x0)),
                       (y0 + 1, x0, (y - y0) * (1 - (x - x0))),
                       (y0 + 1, x0 + 1, (y - y0) * (x - x0))]:
        if 0 <= yi < h and 0 <= xi < w:
            acc += wt * vmap[yi, xi]
    return acc


def test_msdeform_attention_zero_offset_uniform_weights():
    rng = np.random.RandomState(0)
    b, q, c = 1, 5, 8
    nh, npt = 2, 2
    attn = MSDeformAttention(embed_dims=c, num_heads=nh, num_levels=2,
                             num_points=npt)
    query = jnp.asarray(rng.randn(b, q, c).astype(np.float32))
    refs = jnp.asarray(rng.uniform(0.2, 0.8, (b, q, 2)).astype(np.float32))
    values = [jnp.asarray(rng.randn(b, 8, 10, c).astype(np.float32)),
              jnp.asarray(rng.randn(b, 4, 5, c).astype(np.float32))]
    var = attn.init(jr.PRNGKey(0), query, refs, values)
    params = jax.tree_util.tree_map(
        lambda a: np.array(a, copy=True), var["params"])
    # zero the offset and attention-logit branches -> zero offsets, uniform
    # softmax weights
    params["sampling_offsets"]["kernel"][:] = 0
    params["sampling_offsets"]["bias"][:] = 0
    params["attention_weights"]["kernel"][:] = 0
    params["attention_weights"]["bias"][:] = 0
    var = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
    out = np.asarray(attn.apply(var, query, refs, values))

    # numpy reference
    qn = np.asarray(query)[0]
    rn = np.asarray(refs)[0]
    hd = c // nh
    heads = np.zeros((q, nh, hd), np.float32)
    for li, v in enumerate(values):
        vn = np.asarray(v)[0]
        h, w = vn.shape[:2]
        wk = params[f"value_proj{li}"]["kernel"]
        bk = params[f"value_proj{li}"]["bias"]
        proj = vn.reshape(-1, c) @ wk + bk
        proj = proj.reshape(h, w, nh, hd)
        for qi in range(q):
            py = rn[qi, 1] * h - 0.5
            px = rn[qi, 0] * w - 0.5
            for hi in range(nh):
                tap = _bilinear_np(proj[:, :, hi], py, px)
                # npt identical points per level, uniform weight over
                # (levels * points)
                heads[qi, hi] += tap * npt / (2 * npt)
    flat = heads.reshape(q, c)
    expect = flat @ params["output_proj"]["kernel"] \
        + params["output_proj"]["bias"]
    np.testing.assert_allclose(out[0], expect, rtol=1e-4, atol=1e-4)
