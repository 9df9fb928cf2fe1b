"""Similarity-search operator tests that don't fit the recall suites —
currently the bitext margin-mining semantics (`operators/simsearch.py:
bitext_margin_pairs`)."""

from __future__ import annotations


def test_bitext_margin_demotes_hub_promotes_isolated_pair(spark):
    """The margin criterion's whole point: a HUB vector (close to
    everything on the other side) gets margins ~1 because its kNN mean
    is as high as any one cosine, while a genuinely isolated matching
    pair scores a high margin. A raw-cosine ranking would put the hub
    pairs first. Mines with n large enough that hub pairs are
    GUARANTEED in the result, so the near-1 assertion can't pass
    vacuously on an empty set."""
    import numpy as np

    from etl_acordos_spark.operators.simsearch import bitext_margin_pairs

    rng = np.random.RandomState(7)
    dim = 8

    def unit(v):
        v = np.asarray(v, dtype=float)
        return (v / np.linalg.norm(v)).tolist()

    rows = []
    # even ids = side A, odd ids = side B
    # id 0: the isolated pair's A side; id 1: its B match
    iso = rng.randn(dim)
    rows.append((0, unit(iso)))
    rows.append((1, unit(iso + 0.05 * rng.randn(dim))))
    # id 2: hub on side A — equal moderate cosine to every B vector
    hub = np.ones(dim)
    rows.append((2, unit(hub)))
    # B-side background: vectors moderately aligned with the hub
    for i in range(3, 23, 2):
        rows.append((i, unit(hub + 1.5 * rng.randn(dim))))
    # A-side background, orthogonal-ish noise
    for i in range(4, 24, 2):
        rows.append((i, unit(rng.randn(dim))))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    # mine EVERYTHING (n >= all positive pairs) so hub rows are present
    mined = bitext_margin_pairs(df, k=4, n=10_000).collect()
    top = mined[0]
    assert (top.a_id, top.b_id) == (0, 1), mined[:3]
    # raw cosine of the hub's best pair can rival the isolated pair's,
    # but its margins must sit near 1 (its kNN mean is just as high)
    hub_margins = [r.margin for r in mined if r.a_id == 2]
    assert len(hub_margins) >= 4  # the hub really is in the mined set
    # relative, not absolute: a lucky background vector can still align
    # with the hub (measured 1.32 here), but the isolated pair's margin
    # (1.77) must clear the hub's best by a wide gap
    assert max(hub_margins) < 0.8 * top.margin
