"""Deterministic synthetic Common-Crawl-style corpus generator.

Produces the input-hint table shape: (url, warc_ts, html, text, lang) with
the guarantee that ``html_strip(html) == text`` byte-identically per url
(the per-row invariant of BASELINE.json). Shapes mirror the reference's own
test corpora (LineFileDocs title/body line docs,
lucene/test-framework/src/java/org/apache/lucene/util/LineFileDocs.java:49,159-180)
adapted to web pages.

Properties (FIXTURES.md §1):
  - Zipf(~s=1.1) vocabulary of ~10k terms -> real head-term skew
  - log-normal doc lengths (mean ~120 tokens)
  - ~1% docs carry unicode edge cases (CJK, accents, numerics, apostrophes)
  - stopwords appear at natural frequency (position-gap semantics exercised)
  - seeded numpy generation: same seed -> byte-identical corpus
"""

from __future__ import annotations

import html as _html

import numpy as np
import pandas as pd

VOCAB_SIZE = 10_000
_STOPWORD_LIST = (
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with"
).split()

_UNICODE_SNIPPETS = [
    "中文网页测试 searching índices",
    "café naïve résumé coöperate",
    "AUDI A4 vs BMW 3.14159 approx",
    "can't won't it's o'clock",
    "price 1,299.99 ratio 3:4 date 2026.08.16",
    "ひらがな カタカナ 漢字混じり",
    "Ω≈ç√∫ unicode μεγάλο κείμενο",
]


def _make_vocab(rng: np.random.Generator) -> np.ndarray:
    """~10k distinct pronounceable word-ish tokens."""
    syll = np.array(
        "ba be bi bo bu da de di do du ka ke ki ko ku la le li lo lu ma me mi "
        "mo mu na ne ni no nu ra re ri ro ru sa se si so su ta te ti to tu za "
        "zo ve vi vo wa wi xo ya yo zu pra pre tri tro sta sto cra cre".split()
    )
    n_s = len(syll)
    words: set[str] = set()
    out: list[str] = []
    stop = set(_STOPWORD_LIST)
    while len(out) < VOCAB_SIZE:
        need = VOCAB_SIZE - len(out)
        ks = rng.integers(2, 5, size=need * 2)
        idx = rng.integers(0, n_s, size=int(ks.sum()))
        pos = 0
        for k in ks:
            w = "".join(syll[idx[pos : pos + k]])
            pos += k
            if w not in words and w not in stop:
                words.add(w)
                out.append(w)
                if len(out) == VOCAB_SIZE:
                    break
    return np.array(out, dtype=object)


def generate_pages(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """Generate the pages corpus as a pandas DataFrame (deterministic)."""
    rng = np.random.default_rng(seed)
    vocab = _make_vocab(rng)

    # Zipf-ish rank-frequency over the vocab: p_i ∝ 1/(i+1)^1.1
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    probs = 1.0 / ranks**1.1
    probs /= probs.sum()

    body_lens = np.clip(
        rng.lognormal(mean=np.log(110.0), sigma=0.6, size=n_docs), 5, 4000
    ).astype(np.int64)
    title_lens = rng.integers(3, 9, size=n_docs)

    total_body = int(body_lens.sum())
    total_title = int(title_lens.sum())
    body_tok = vocab[rng.choice(VOCAB_SIZE, size=total_body, p=probs)]
    title_tok = vocab[rng.choice(VOCAB_SIZE, size=total_title, p=probs)]

    # inject stopwords at ~natural frequency (~25% of body positions)
    stop_arr = np.array(_STOPWORD_LIST, dtype=object)
    stop_mask = rng.random(total_body) < 0.25
    body_tok[stop_mask] = stop_arr[rng.integers(0, len(stop_arr), stop_mask.sum())]

    b_off = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(body_lens, out=b_off[1:])
    t_off = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(title_lens, out=t_off[1:])

    uni_mask = rng.random(n_docs) < 0.01
    uni_pick = rng.integers(0, len(_UNICODE_SNIPPETS), size=n_docs)

    urls, texts, htmls = [], [], []
    for i in range(n_docs):
        title = " ".join(title_tok[t_off[i] : t_off[i + 1]])
        body = " ".join(body_tok[b_off[i] : b_off[i + 1]])
        if uni_mask[i]:
            body = body + " " + _UNICODE_SNIPPETS[uni_pick[i]]
        text = title + "\n" + body
        h = (
            "<html><head><title>"
            + _html.escape(title)
            + "</title>\n<script type=\"text/javascript\">var q = 1 &lt; 2;</script>"
            + "<style>.c{color:red}</style></head><body><p>"
            + _html.escape(body)
            + "</p><!-- crawler-note --></body></html>"
        )
        urls.append(f"https://site{i % 1000}.example/p/{i}")
        texts.append(text)
        htmls.append(h.encode("utf-8"))

    base_ts = np.datetime64("2026-01-01T00:00:00")
    warc_ts = base_ts + np.arange(n_docs).astype("timedelta64[s]")
    lang = np.where(rng.random(n_docs) < 0.02, "xx", "en")

    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": warc_ts,
            "html": htmls,
            "text": texts,
            "lang": lang,
        }
    )


def write_pages_parquet(
    path: str, n_docs: int, seed: int = 42, n_files: int = 32
) -> None:
    """Write the corpus as a directory of ``n_files`` parquet files so Spark
    scans parallelize (one giant file = one scan task = an artificial serial
    stage that would never exist in a real multi-file web corpus)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = generate_pages(n_docs, seed)
    os.makedirs(path, exist_ok=True)
    step = (len(pdf) + n_files - 1) // n_files
    for i in range(n_files):
        chunk = pdf.iloc[i * step : (i + 1) * step]
        if len(chunk) == 0:
            break
        tbl = pa.Table.from_pandas(chunk, preserve_index=False)
        pq.write_table(tbl, os.path.join(path, f"part-{i:04d}.parquet"))
