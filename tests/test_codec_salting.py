"""Salted (chunked) head-term encoding: independently-encoded docid-range
chunks stitch into a byte-compatible posting row (the merge-time skew
escape hatch described in SCALE.md), plus hypothesis property tests for
the codec and minifloat kernels."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from lucene_solr_spark.index import codec
from lucene_solr_spark.search import bm25


def _random_postings(rng, df, max_doc):
    docids = np.sort(rng.choice(max_doc, size=df, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 200, size=df).astype(np.int64)
    positions = [np.sort(rng.choice(5000, size=tf, replace=False)) for tf in tfs]
    return docids, tfs, np.concatenate(positions)


@pytest.mark.parametrize("df,n_chunks", [(1000, 2), (4096, 4), (300, 3), (129, 2)])
def test_salted_chunks_decode_identically(df, n_chunks):
    rng = np.random.default_rng(df)
    docids, tfs, posflat = _random_postings(rng, df, df * 5)
    norms = rng.integers(80, 140, df * 5).astype(np.uint8)

    mono = codec.encode_term_postings(docids, tfs, norms, posflat)

    # split by docid range into chunks, encode independently, stitch
    cuts = np.linspace(0, df, n_chunks + 1).astype(int)
    tf_ends = np.cumsum(tfs)
    tf_starts = tf_ends - tfs
    chunks = []
    for i in range(n_chunks):
        lo, hi = cuts[i], cuts[i + 1]
        base = -1 if lo == 0 else int(docids[lo - 1])
        p0 = tf_starts[lo]
        p1 = tf_ends[hi - 1]
        chunks.append(
            codec.encode_term_chunk(
                docids[lo:hi], tfs[lo:hi], base, norms, posflat[p0:p1]
            )
        )
    stitched = codec.stitch_term_chunks(chunks)

    assert stitched["df"] == mono["df"] and stitched["ttf"] == mono["ttf"]
    d, t = codec.decode_blocks(
        stitched["blocks"], stitched["df"], stitched["skip_off"], stitched["skip_last"]
    )
    np.testing.assert_array_equal(d, docids)
    np.testing.assert_array_equal(t, tfs)
    # chunk boundaries break the 128-block grid, so skip arrays differ from
    # the monolithic encode; what must hold: every block's metadata is
    # self-consistent and selective decode works
    nblocks = len(stitched["skip_last"])
    for bi in range(nblocks):
        db, tb = codec.decode_blocks(
            stitched["blocks"], stitched["df"], stitched["skip_off"],
            stitched["skip_last"], np.array([bi]),
        )
        assert db[-1] == stitched["skip_last"][bi]
        assert tb.max() == stitched["skip_max_tf"][bi]
        assert norms[db].max() == stitched["skip_max_norm"][bi]
        pls = codec.decode_positions_for_block(
            stitched["positions"], tb, stitched["skip_pos_off"][bi]
        )
        sel = np.searchsorted(docids, db)
        for j, pl in enumerate(pls):
            np.testing.assert_array_equal(
                pl, posflat[tf_starts[sel[j]] : tf_ends[sel[j]]]
            )


@given(
    st.lists(st.integers(0, 1 << 50), min_size=0, max_size=300),
)
@settings(max_examples=50, deadline=None)
def test_varint_roundtrip_property(vals):
    v = np.array(vals, dtype=np.uint64)
    out = codec.varint_decode(codec.varint_encode(v), count=len(v)) if len(v) else []
    np.testing.assert_array_equal(np.asarray(out, dtype=np.int64), v.astype(np.int64))


@given(st.integers(1, 10_000), st.integers(0, 2**32))
@settings(max_examples=80, deadline=None)
def test_postings_roundtrip_property(df, seed):
    df = min(df, 2000)
    rng = np.random.default_rng(seed)
    docids = np.sort(rng.choice(df * 7, size=df, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 1 << 17, size=df).astype(np.int64)  # exercises 4-byte widths
    enc = codec.encode_term_postings(docids, tfs)
    d, t = codec.decode_blocks(enc["blocks"], df, enc["skip_off"], enc["skip_last"])
    np.testing.assert_array_equal(d, docids)
    np.testing.assert_array_equal(t, tfs)


@given(st.floats(min_value=0, max_value=1e12, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_smallfloat_monotone_and_bounded(x):
    """encode is monotone non-decreasing; decode(encode(x)) <= ~x for
    positives in range (truncating semantics, SmallFloat.java:28-33)."""
    b = int(bm25.float_to_byte315(np.array([x], dtype=np.float32))[0])
    b2 = int(bm25.float_to_byte315(np.array([x * 1.5 + 1e-9], dtype=np.float32))[0])
    assert b2 >= b
    dec = float(bm25.byte315_to_float(np.array([b], dtype=np.uint8))[0])
    if 1e-9 < x < 7e9:
        assert dec <= x * (1 + 2e-7) + 1e-12
        assert dec >= x / 1.35  # truncating minifloat: worst case ~20% down


@given(st.integers(1, 5), st.integers(0, 2**32))
@settings(max_examples=30, deadline=None)
def test_analyzer_oracle_equivalence_property(n_docs, seed):
    """Random ASCII-ish texts: hybrid tokenizer == regex reference."""
    import pandas as pd

    from lucene_solr_spark.analysis import text as TX

    rng = np.random.default_rng(seed)
    alphabet = list("abc XY12 .,:'- \t\n#@!()ä中")
    texts = pd.Series(
        ["".join(rng.choice(alphabet, size=rng.integers(0, 120))) for _ in range(n_docs)]
    )
    hy = TX.tokenize_series(texts)
    rg = TX._tokenize_regex(texts.reset_index(drop=True))
    # hybrid may merge multi-joiner runs the regex splits; skip those cases
    joined = "".join(texts)
    import re

    if re.search(r"[\w][.,:']{2,}[\w]", joined):
        return
    np.testing.assert_array_equal(hy["doc_idx"].to_numpy(), rg[0])
    np.testing.assert_array_equal(np.asarray(hy["term"].astype(str)), rg[1])
    np.testing.assert_array_equal(hy["pos"].to_numpy(), rg[2])


@given(st.integers(2, 5), st.integers(0, 10_000))
@settings(max_examples=30, deadline=None)
def test_bulk_merge_rebase_stitch_property(n_sources, seed):
    """Round-2 merge fast path: _rebased_chunk (block-0-only re-encode) +
    stitch decodes identically to the concatenation of the source decodes,
    for random per-source postings with positions."""
    from types import SimpleNamespace

    from lucene_solr_spark.index.merge import _rebased_chunk

    rng = np.random.default_rng(seed)
    offs = [0]
    sources = []
    for si in range(n_sources):
        max_doc = int(rng.integers(5, 600))
        df = int(rng.integers(1, max_doc + 1))
        docids = np.sort(rng.choice(max_doc, df, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 6, df).astype(np.int64)
        pos = np.concatenate([
            np.sort(rng.choice(1000, t, replace=False)) for t in tfs
        ])
        enc = codec.encode_term_postings(docids, tfs, positions=pos)
        sources.append((docids, tfs, pos, enc))
        offs.append(offs[-1] + max_doc)

    chunks = []
    last = -1
    for si, (_d, _t, _p, enc) in enumerate(sources):
        row = SimpleNamespace(
            df=enc["df"], ttf=enc["ttf"], blocks=enc["blocks"],
            positions=enc["positions"], skip_off=enc["skip_off"],
            skip_last=enc["skip_last"], skip_pos_off=enc["skip_pos_off"],
            skip_max_tf=enc["skip_max_tf"], skip_max_norm=enc["skip_max_norm"],
        )
        ch = _rebased_chunk(row, offs[si], last)
        last = int(np.asarray(ch["skip_last"])[-1])
        chunks.append(ch)
    merged = codec.stitch_term_chunks(chunks)

    got_d, got_t = codec.decode_blocks(
        merged["blocks"], merged["df"],
        np.asarray(merged["skip_off"], np.int64),
        np.asarray(merged["skip_last"], np.int64),
    )
    exp_d = np.concatenate([d + offs[si] for si, (d, _t, _p, _e) in enumerate(sources)])
    exp_t = np.concatenate([t for (_d, t, _p, _e) in sources])
    np.testing.assert_array_equal(got_d, exp_d)
    np.testing.assert_array_equal(got_t, exp_t)

    # positions: decode per block through the stitched skip metadata
    sp = np.asarray(merged["skip_pos_off"], np.int64)
    so = np.asarray(merged["skip_off"], np.int64)
    sl = np.asarray(merged["skip_last"], np.int64)
    exp_pos = np.concatenate([p for (_d, _t, p, _e) in sources])
    got_pos = []
    lo = 0
    for bi in range(len(sl)):
        bd, bt = codec.decode_blocks(merged["blocks"], merged["df"], so, sl,
                                     np.array([bi]))
        pl = codec.decode_positions_for_block(merged["positions"], bt, sp[bi])
        got_pos.extend(pl)
        lo += len(bd)
    np.testing.assert_array_equal(np.concatenate(got_pos), exp_pos)
