"""Host projective EC ops (utils/hostcurve) vs the affine ref oracle."""

import random

from rapidsnark_tpu.ref import curve as refc
from rapidsnark_tpu.ref.field import R_FR
from rapidsnark_tpu.utils.hostcurve import G1H, G2H

rng = random.Random(11)


def _check(group, hgroup, gen):
    pts = [group.mul(gen, rng.randrange(1, R_FR)) for _ in range(4)]
    cases = pts + [None, pts[0], group.neg(pts[0])]
    # add: all pairs incl. doubling, inverse, infinity lanes
    for a in cases:
        for b in cases:
            got = hgroup.to_affine(
                hgroup.add(hgroup.from_affine(a), hgroup.from_affine(b)))
            assert group.eq(got, group.add(a, b))
    # scalar mul incl. 0, 1, >order (plain-int semantics)
    for k in (0, 1, 2, rng.randrange(R_FR), R_FR + 5):
        got = hgroup.to_affine(hgroup.mul(hgroup.from_affine(pts[1]), k))
        assert group.eq(got, group.mul(pts[1], k))
    # window combine == sum_w 2^(wc) W_w
    c = 5
    wins = [group.mul(gen, rng.randrange(1, R_FR)) for _ in range(6)]
    got = hgroup.to_affine(hgroup.combine_windows(
        [hgroup.from_affine(w) for w in wins], c))
    expect = None
    for w, wp in enumerate(wins):
        expect = group.add(expect, group.mul(wp, 1 << (w * c)))
    assert group.eq(got, expect)


def test_g1_host_proj():
    _check(refc.G1, G1H, refc.G1_GEN)


def test_g2_host_proj():
    _check(refc.G2, G2H, refc.G2_GEN)
