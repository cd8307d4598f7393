#!/usr/bin/env python3
"""Generate libpll_tpu/models/aa_tables.py from the compiled reference core.

The empirical amino-acid replacement models (Dayhoff, LG, WAG, ... and the
LG4M/LG4X mixtures) are published numeric tables; log-likelihood parity
requires value-identical constants, so they are extracted from the compiled
reference library rather than re-typed. Run from the repo root:

    python scripts/gen_aa_tables.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
import oracle  # noqa: E402

MODELS = [
    "dayhoff", "lg", "dcmut", "jtt", "mtrev", "wag", "rtrev", "cprev", "vt",
    "blosum62", "mtmam", "mtart", "mtzoa", "pmb", "hivb", "hivw", "jttdcmut",
    "flu", "stmtrev",
]
MIXTURES = ["lg4m", "lg4x"]

HEADER = '''"""Empirical amino-acid replacement model tables.

Capability parity with the model tables of libpll (`src/pll.h:480-522`,
bodies `src/maps.c:143-1165`): 19 single-matrix models as 190 exchangeability
rates + 20 stationary frequencies each, plus the LG4M and LG4X four-matrix
mixtures (4×190 rates, 4×20 frequencies; one matrix per Γ rate category).

These are published scientific constants (Dayhoff et al. 1978; Le & Gascuel
2008; Whelan & Goldman 2001; ...). The values in this file are extracted
verbatim from the compiled reference library by scripts/gen_aa_tables.py —
they must be bit-identical for log-likelihood parity and are verified
against the oracle in tests.
"""

import numpy as np

'''


def fmt_array(a: np.ndarray, per_line: int = 4) -> str:
    flat = a.ravel()
    chunks = [", ".join(repr(float(x)) for x in flat[i:i + per_line])
              for i in range(0, len(flat), per_line)]
    body = ",\n    ".join(chunks)
    if a.ndim == 1:
        return f"np.array([\n    {body},\n])"
    return f"np.array([\n    {body},\n]).reshape{a.shape!r}"


def main() -> None:
    out = [HEADER]
    names_r, names_f = [], []
    for m in MODELS:
        rates = oracle.aa_table(f"pll_aa_rates_{m}", 190)
        freqs = oracle.aa_table(f"pll_aa_freqs_{m}", 20)
        out.append(f"AA_RATES_{m.upper()} = {fmt_array(rates)}\n")
        out.append(f"AA_FREQS_{m.upper()} = {fmt_array(freqs)}\n")
        names_r.append(m)
    for m in MIXTURES:
        rates = oracle.aa_table(f"pll_aa_rates_{m}", 4 * 190)
        freqs = oracle.aa_table(f"pll_aa_freqs_{m}", 4 * 20)
        out.append(f"AA_RATES_{m.upper()} = "
                   f"{fmt_array(rates.reshape(4, 190))}\n")
        out.append(f"AA_FREQS_{m.upper()} = "
                   f"{fmt_array(freqs.reshape(4, 20))}\n")

    out.append("AA_MODELS = {\n")
    for m in MODELS:
        out.append(f'    "{m}": (AA_RATES_{m.upper()}, '
                   f"AA_FREQS_{m.upper()}),\n")
    out.append("}\n\n")
    out.append("AA_MIXTURE_MODELS = {\n")
    for m in MIXTURES:
        out.append(f'    "{m}": (AA_RATES_{m.upper()}, '
                   f"AA_FREQS_{m.upper()}),\n")
    out.append("}\n")

    path = os.path.join(os.path.dirname(__file__), "..", "libpll_tpu",
                        "models", "aa_tables.py")
    with open(path, "w") as fh:
        fh.write("".join(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
