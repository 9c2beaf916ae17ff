"""Plain-text contact loader.

Accepts the two reference text layouts (mustache.py:254-297):

* 5-column ``chrom1 mid1 chrom2 mid2 count``
* 3-column ``mid1 mid2 count``

and returns upper-triangular COO triplets ``(x, y, v)`` in bin units with
the band filter ``|mid1 - mid2| <= (distance_bp/res + 1) * res`` applied on
the original bp coordinates (reference line :264) and counts divided by the
bias factor at both anchors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def sniff_separator(path: str) -> str:
    """Guess the column separator from the first line (mustache.py:199-215)."""
    with open(path) as fh:
        for line in fh:
            if "\t" in line:
                return "\t"
            if " " in line.strip():
                return " "
            if "," in line:
                return ","
            if len(line.split(" ")) == 1:
                return " "
            break
    raise FileNotFoundError(path)


def read_text_contacts(path: str, distance_bp: int, bias, chromosome, res: int):
    """Load COO triplets for one chromosome from a text contact list.

    ``bias`` is a :class:`mustache_tpu.io.bias.BiasVector` or ``False``.
    Returns ``(x, y, v)`` int64/int64/float64 arrays, possibly empty.
    """
    from mustache_tpu.io.chrom import normalize_chrom

    empty = (np.array([], np.int64), np.array([], np.int64), np.array([], np.float64))
    sep = sniff_separator(path)
    df = pd.read_csv(path, sep=sep, header=None)
    df = df.dropna()
    if df.shape[1] == 5:
        want = normalize_chrom(chromosome)
        chrom_ok = (
            df[0].astype(str).str.replace("chr", "", regex=False).eq(want)
            & df[2].astype(str).str.replace("chr", "", regex=False).eq(want)
        )
        df = df.loc[chrom_ok]
        if df.shape[0] == 0:
            return empty
        m1 = df[1].to_numpy(np.float64)
        m2 = df[3].to_numpy(np.float64)
        count = df[4].to_numpy(np.float64)
    elif df.shape[1] == 3:
        m1 = df[0].to_numpy(np.float64)
        m2 = df[1].to_numpy(np.float64)
        count = df[2].to_numpy(np.float64)
    else:
        raise ValueError(f"unsupported column count {df.shape[1]} in {path}")

    keep = np.abs(m1 - m2) <= (distance_bp / res + 1) * res
    m1, m2, v = m1[keep], m2[keep], count[keep]

    b1 = np.floor_divide(m1, res)
    b2 = np.floor_divide(m2, res)
    if bias:
        v = v / bias.lookup(b1)
        v = v / bias.lookup(b2)

    pos = v > 0
    b1, b2, v = b1[pos], b2[pos], v[pos]
    x = np.minimum(b1, b2).astype(np.int64)
    y = np.maximum(b1, b2).astype(np.int64)
    return x, y, np.asarray(v, dtype=np.float64)
