"""Batched TPU RS decoder vs the scalar reference implementation."""
import numpy as np
import pytest

from dumpvdl2_tpu.fec import rs
from dumpvdl2_tpu.fec.rs_tpu import rs_decode_batch, rs_verify_batch

NN, KK, T = rs.NN, rs.KK, rs.NROOTS


def _random_codeword(rng):
    return rs.encode(rng.integers(0, 256, KK, dtype=np.uint8))


def test_matches_scalar_on_random_error_patterns():
    rng = np.random.default_rng(0)
    cases = []
    for _ in range(200):
        cw = _random_codeword(rng).astype(np.int32)
        n_err = rng.integers(0, 5)          # 0..4 random errors
        pos = rng.choice(NN, size=n_err, replace=False)
        for p in pos:
            cw[p] ^= rng.integers(1, 256)
        cases.append(cw)
    batch = np.stack(cases)
    erase = np.zeros((len(cases), T), np.int32)
    nerase = np.zeros(len(cases), np.int32)

    got_cw, got_cnt = rs_decode_batch(batch, erase, nerase)
    got_cw, got_cnt = np.asarray(got_cw), np.asarray(got_cnt)
    for i, cw in enumerate(cases):
        exp_cw, exp_cnt = rs.decode(cw)
        assert got_cnt[i] == exp_cnt, f"case {i}: {got_cnt[i]} != {exp_cnt}"
        if exp_cnt >= 0:
            np.testing.assert_array_equal(got_cw[i], exp_cw,
                                          err_msg=f"case {i}")


def test_matches_scalar_with_erasures():
    rng = np.random.default_rng(1)
    batch, eras, ners, scalars = [], [], [], []
    for _ in range(150):
        cw = _random_codeword(rng).astype(np.int32)
        ne = int(rng.integers(0, T + 1))
        epos = rng.choice(NN, size=ne, replace=False).astype(np.int32)
        # wipe erased positions and add a few extra errors within budget
        for p in epos:
            cw[p] = rng.integers(0, 256)
        n_extra = int(rng.integers(0, max(1, (T - ne) // 2 + 1)))
        extra = rng.choice([p for p in range(NN) if p not in set(epos)],
                           size=n_extra, replace=False)
        for p in extra:
            cw[p] ^= rng.integers(1, 256)
        batch.append(cw)
        pad = np.zeros(T, np.int32)
        pad[:ne] = epos
        eras.append(pad)
        ners.append(ne)
        scalars.append(rs.decode(cw, [int(p) for p in epos]))
    got_cw, got_cnt = rs_decode_batch(np.stack(batch), np.stack(eras),
                                      np.array(ners, np.int32))
    got_cw, got_cnt = np.asarray(got_cw), np.asarray(got_cnt)
    for i, (exp_cw, exp_cnt) in enumerate(scalars):
        assert got_cnt[i] == exp_cnt, f"case {i}"
        if exp_cnt >= 0:
            np.testing.assert_array_equal(got_cw[i], exp_cw,
                                          err_msg=f"case {i}")


def test_uncorrectable_flags_failure():
    rng = np.random.default_rng(2)
    cw = _random_codeword(rng).astype(np.int32)
    pos = rng.choice(NN, size=5, replace=False)   # 5 errors > t=3
    for p in pos:
        cw[p] ^= rng.integers(1, 256)
    exp_cw, exp_cnt = rs.decode(cw)
    got_cw, got_cnt = rs_decode_batch(cw[None], np.zeros((1, T), np.int32),
                                      np.zeros(1, np.int32))
    assert int(got_cnt[0]) == exp_cnt


def test_verify_batch_shortened_blocks():
    rng = np.random.default_rng(3)
    rows, fecs, scalars = [], [], []
    for fec_octets in (0, 2, 4, 6, 6, 2):
        cw = _random_codeword(rng).astype(np.int32)
        # zero out absent parity (shortened block layout)
        cw[KK + fec_octets:] = 0
        if fec_octets:
            p = rng.integers(0, KK)
            cw[p] ^= rng.integers(1, 256)
        rows.append(cw)
        fecs.append(fec_octets)
        scalars.append(rs.rs_verify(cw, fec_octets))
    got_cw, got_cnt = rs_verify_batch(np.stack(rows),
                                      np.array(fecs, np.int32))
    got_cw, got_cnt = np.asarray(got_cw), np.asarray(got_cnt)
    for i, (exp_cw, exp_cnt) in enumerate(scalars):
        assert got_cnt[i] == exp_cnt, f"row {i} fec={fecs[i]}"
        if exp_cnt >= 0:
            np.testing.assert_array_equal(got_cw[i], exp_cw,
                                          err_msg=f"row {i}")
