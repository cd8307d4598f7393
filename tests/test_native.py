"""Native C++ host-runtime parity (libpll_tpu/native/host.cpp) against the
pure-Python implementations — the rebuild's host-layer analog of the
reference's generic-vs-SIMD kernel cross-validation."""

import numpy as np
import pytest

from libpll_tpu import native
from libpll_tpu.io import maps
from libpll_tpu.io.compress import compress_site_patterns

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no native toolchain")


def test_compress_matches_python():
    rng = np.random.default_rng(0)
    seqs = ["".join(rng.choice(list("ACGT-"), 400)) for _ in range(12)]
    cm = np.asarray(maps.pll_map_nt, dtype=np.uint32)
    # compress_site_patterns dispatches to native when available; compare
    # against the raw numpy implementation by calling both layers directly
    mat = np.frombuffer("".join(seqs).encode(), np.uint8).reshape(12, -1)
    nat_out, nat_w = native.compress_patterns(mat, cm)

    cols = mat.T.copy()
    _, first_idx, counts = np.unique(cols, axis=0, return_index=True,
                                     return_counts=True)
    order = np.argsort(first_idx, kind="stable")
    ref_w = counts[order]
    ref = cols[np.sort(first_idx)].T
    assert np.array_equal(nat_out, ref)
    assert np.array_equal(nat_w.astype(np.int64), ref_w)

    # and the public API returns the same thing
    out, w = compress_site_patterns(seqs, cm)
    assert np.array_equal(
        np.frombuffer("".join(out).encode(), np.uint8).reshape(12, -1), ref)
    assert np.array_equal(np.asarray(w), ref_w)


def test_compress_illegal_char():
    cm = np.asarray(maps.pll_map_nt, dtype=np.uint32)
    mat = np.frombuffer(b"ACJT", np.uint8).reshape(1, 4).copy()
    with pytest.raises(ValueError, match="offset 2"):
        native.compress_patterns(mat, cm)


def test_encode_tips():
    cm = np.asarray(maps.pll_map_nt, dtype=np.uint32)
    masks = native.encode_tips(b"ACGT-N", cm)
    assert masks.tolist() == [int(cm[ord(c)]) for c in "ACGT-N"]
    with pytest.raises(ValueError, match="position 2"):
        native.encode_tips(b"ACJT", cm)


def test_fasta_scan_matches_python(tmp_path):
    body = (">first record\nACGT\nACG-\n\n>second\nNNTT\n"
            ">third has spaces\nA C\nGT\n")
    path = tmp_path / "t.fas"
    path.write_text(body)

    from libpll_tpu.io.fasta import FastaReader
    r = FastaReader(str(path))
    headers, seqs = r.read_all()  # dispatches to native
    assert headers == ["first record", "second", "third has spaces"]
    assert seqs == ["ACGTACG-", "NNTT", "ACGT"]

    # python iterator agrees record-by-record
    py = [(rec.header, rec.sequence) for rec in r]
    assert py == list(zip(headers, seqs))


def test_fasta_scan_structural_error():
    cm = np.asarray(maps.pll_map_fasta, dtype=np.uint32)
    with pytest.raises(ValueError, match="line 0"):
        native.fasta_scan(b"ACGT\n>x\nAC\n", cm)
