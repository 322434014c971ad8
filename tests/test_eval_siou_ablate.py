"""The 'siou' ablation knob (bench BENCH_ABLATE=siou -> predict_segmentation
skip_siou): mean-shift clustering must still run (same labels/cluster count
as the unablated path) while the SIOU/LAP matching is stubbed to constants.
This is what lets the roofline split matching cost from mean-shift cost
(scripts/roofline.py stage_costs)."""
import jax
import jax.numpy as jnp
import numpy as np

from parsenet_tpu.eval.pipeline import predict_segmentation
from parsenet_tpu.models.dgcnn import PrimitivesEmbedding

N_PTS = 256


def test_skip_siou_stubs_matching_but_not_clustering():
    model = PrimitivesEmbedding(emb_size=16, num_primitives=10, mode=5, k=4)
    x = jnp.asarray(np.random.RandomState(0).randn(N_PTS, 6).astype(
        np.float32))
    params = model.init(jax.random.PRNGKey(0), x[None])["params"]
    apply_fn = jax.tree_util.Partial(
        lambda xx: model.apply({"params": params}, xx))
    labels = jnp.asarray(np.random.RandomState(1).randint(0, 4, N_PTS))
    prim = jnp.asarray(np.random.RandomState(2).randint(0, 6, N_PTS))
    kw = dict(ms_num_samples=N_PTS, iterations=5)

    full = predict_segmentation(apply_fn, x, labels, prim,
                                jax.random.PRNGKey(3), **kw)
    ablated = predict_segmentation(apply_fn, x, labels, prim,
                                   jax.random.PRNGKey(3), skip_siou=True,
                                   **kw)

    assert float(ablated.seg_iou) == 1.0
    assert float(ablated.prim_iou) == 1.0
    np.testing.assert_array_equal(np.asarray(ablated.labels),
                                  np.asarray(full.labels))
    assert int(ablated.num_clusters) == int(full.num_clusters)
    # the unablated path computed a real (non-stub) matching score
    assert 0.0 <= float(full.seg_iou) <= 1.0
