"""VP8 key-frame codec suite (operators/vp8.py).

Layers, weakest-to-strongest dependence on shared code:

1. boolean-coder property tests — the decoder is the RFC §7.3
   pseudocode; the encoder's ONLY contract is round-tripping against
   it over randomized bit/prob sequences;
2. hand-computed pins — iDCT/iWHT DC identities, filter-limit
   derivation, predictor border values computed by hand in the test;
3. bit-exact fixture round-trips across the header surface
   (partitions, skip, quantizer indexes, prob updates);
4. shared-semantics round-trips for the paths lossy by construction
   (loop filters, non-DC predictor chains) — these prove
   encoder/decoder agreement, not external-stream interop (see the
   module docstring's honesty boundary on the probability tables).
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from fame2pygen_spark.operators.vp8 import (
    B_DC,
    B_HD,
    B_HE,
    B_HU,
    B_LD,
    B_RD,
    B_TM,
    B_VE,
    B_VL,
    B_VR,
    BoolDecoder,
    BoolEncoder,
    COEFF_TREE,
    DC_PRED,
    H_PRED,
    TM_PRED,
    V_PRED,
    _filter_limits,
    _pred_b,
    _tree_path,
    decode_vp8_keyframe,
    decode_vp8_rgb,
    encode_vp8_keyframe,
    idct4x4,
    iwht4x4,
    wrap_webp_vp8,
)


def _flat_image(seed=7, size=64):
    rng = np.random.RandomState(seed)
    n = size // 4
    return rng.randint(0, 256, (n, n), dtype=np.uint8).repeat(4, 0).repeat(
        4, 1
    )


# ------------------------------------------------------------- layer 1


def test_bool_coder_roundtrip_randomized():
    rng = random.Random(1234)
    for _ in range(200):
        n = rng.randint(1, 500)
        seq = [
            (rng.randint(0, 1),
             rng.choice([1, 2, 15, 64, 128, 192, 253, 254]))
            for _ in range(n)
        ]
        e = BoolEncoder()
        for bit, p in seq:
            e.encode(bit, p)
        d = BoolDecoder(e.get_bytes())
        for bit, p in seq:
            assert d.decode(p) == bit


def test_bool_coder_literals_and_trees():
    e = BoolEncoder()
    e.literal(0x5A, 8)
    e.signed_literal(-7, 4)
    e.tree(COEFF_TREE, (128,) * 11, 11)  # EOB
    e.tree(COEFF_TREE, (128,) * 11, 0)  # DCT_0
    e.tree(COEFF_TREE, (128,) * 11, 10)  # CAT6
    d = BoolDecoder(e.get_bytes())
    assert d.literal(8) == 0x5A
    assert d.signed_literal(4) == -7
    assert d.tree(COEFF_TREE, (128,) * 11) == 11
    assert d.tree(COEFF_TREE, (128,) * 11) == 0
    assert d.tree(COEFF_TREE, (128,) * 11) == 10


def test_tree_paths_cover_all_tokens():
    for tok in range(12):
        path = _tree_path(COEFF_TREE, tok)
        assert path is not None
        # replay the path through the tree → same leaf
        i = 0
        for bit in path[:-1]:
            i = COEFF_TREE[i + bit]
            assert i > 0
        assert COEFF_TREE[i + path[-1]] == -tok


# ------------------------------------------------------------- layer 2


def test_idct_dc_only_identity():
    # (8r + 4) >> 3 == r for every residual −255..255 — the exactness
    # lemma the fixture encoder is built on
    for r in range(-255, 256):
        out = idct4x4([8 * r] + [0] * 15)
        assert all(v == r for v in out), r


def test_iwht_dc_only_flat():
    out = iwht4x4([24] + [0] * 15)
    # two (x+3)>>3 passes of a pure-DC input spread it flat
    assert len(set(out)) == 1


def test_filter_limit_derivation():
    # hand-computed from the §15.1 rules
    assert _filter_limits(0, 0) == (1, 5, 1, 0)  # interior floor 1
    assert _filter_limits(10, 0) == (10, 34, 30, 0)
    assert _filter_limits(20, 2) == (7, 51, 47, 1)  # 20>>1=10 → cap 7
    assert _filter_limits(40, 5) == (4, 88, 84, 2)  # 40>>2=10 → cap 4


def test_b_dc_border_prediction_by_hand():
    # first subblock of the frame: above = 4×127, left = 4×129
    plane = [[0] * 64 for _ in range(64)]
    pred = _pred_b(plane, 0, 0, 64, B_DC)
    assert pred[0][0] == (4 * 127 + 4 * 129 + 4) >> 3 == 128
    # B_VE over the 127 border smooths to 127
    pred = _pred_b(plane, 0, 0, 64, B_VE)
    assert all(v == 127 for row in pred for v in row)
    # B_TM at the corner: clamp(129 + 127 - 127) = 129 everywhere
    pred = _pred_b(plane, 0, 0, 64, B_TM)
    assert all(v == 129 for row in pred for v in row)


def test_b_diagonal_prediction_by_hand():
    # known left/above content, interior subblock at (4, 4)
    plane = [[50] * 64 for _ in range(64)]
    for y in range(64):
        plane[y][3] = 10 + y  # left col of the (4,4) block is col 3
    for x in range(64):
        plane[3][x] = 200  # above row is row 3
    pred = _pred_b(plane, 4, 4, 64, B_LD)
    # B_LD row0 col0 = avg3(A0, A1, A2) = 200
    assert pred[0][0] == 200
    pred = _pred_b(plane, 4, 4, 64, B_HU)
    # B_HU (0,0) = (L0 + L1 + 1) >> 1 with L0=14, L1=15
    assert pred[0][0] == (14 + 15 + 1) >> 1
    pred = _pred_b(plane, 4, 4, 64, B_RD)
    # B_RD (0,0) = (L0 + 2P + A0 + 2) >> 2 = (14 + 2*200 + 200 + 2) >> 2
    assert pred[0][0] == (14 + 2 * 200 + 200 + 2) >> 2


# ------------------------------------------------------------- layer 3


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"n_partitions": 2},
        {"n_partitions": 4},
        {"n_partitions": 8},
        {"use_skip": False},
        {"y_ac_qi": 15},
        {"uv_dc_delta": 5, "uv_ac_delta": -3},
        {"update_probs": ((0, 0, 0, 3, 77), (3, 6, 2, 10, 9))},
    ],
)
def test_fixture_roundtrip_bit_exact(kw):
    img = _flat_image()
    f = decode_vp8_keyframe(encode_vp8_keyframe(img.tolist(), **kw))
    assert (np.array(f["y"], dtype=np.uint8) == img).all()
    assert (np.array(f["u"]) == 128).all()
    assert (np.array(f["v"]) == 128).all()
    assert f["filter_level"] == 0


def test_rgb_and_container_path():
    img = _flat_image(seed=11)
    payload = wrap_webp_vp8(encode_vp8_keyframe(img.tolist()))
    from fame2pygen_spark.operators.multimodal import decode_image_bytes

    # fixture-lane opt-in: this stream comes from encode_vp8_keyframe,
    # the one provenance that round-trips under fixture tables (r10 gate)
    rgb = decode_image_bytes(payload, allow_fixture_vp8=True)
    assert rgb.shape == (64, 64, 3)
    for ch in range(3):  # gray: R = G = B = Y exactly
        assert (rgb[:, :, ch] == img).all()
    direct = decode_vp8_rgb(encode_vp8_keyframe(img.tolist()))
    assert (direct == rgb).all()


def test_interframe_and_bad_magic_raise():
    img = _flat_image()
    data = bytearray(encode_vp8_keyframe(img.tolist()))
    data[0] |= 1  # key_frame bit → interframe
    with pytest.raises(ValueError, match="interframe"):
        decode_vp8_keyframe(bytes(data))
    data = bytearray(encode_vp8_keyframe(img.tolist()))
    data[3] = 0x00
    with pytest.raises(ValueError, match="start code"):
        decode_vp8_keyframe(bytes(data))


# ------------------------------------------------------------- layer 4


def test_all_b_modes_decode_shared_semantics():
    img = _flat_image(seed=3)
    modes = [B_TM, B_VE, B_HE, B_LD, B_RD, B_VR, B_VL, B_HD, B_HU]

    def plan(my, mx):
        if (my + mx) % 2 == 1:
            return modes[(my * 4 + mx) % len(modes)]
        return None

    f = decode_vp8_keyframe(
        encode_vp8_keyframe(img.tolist(), mode_plan=plan)
    )
    got = np.array(f["y"], dtype=np.uint8)
    # the exact-lane MBs stay bit-exact even with predictor-chain
    # neighbors (their residuals re-anchor them to the input)
    for my in range(4):
        for mx in range(4):
            if (my + mx) % 2 == 0:
                s = np.s_[my * 16:(my + 1) * 16, mx * 16:(mx + 1) * 16]
                assert (got[s] == img[s]).all(), (my, mx)


@pytest.mark.parametrize("use_skip", [True, False])
def test_whole_mb_modes_and_y2_path(use_skip):
    img = _flat_image(seed=9)
    mb = [("mb", DC_PRED), ("mb", V_PRED), ("mb", H_PRED), ("mb", TM_PRED)]

    def plan(my, mx):
        return mb[mx % 4] if my == 1 else None

    f = decode_vp8_keyframe(
        encode_vp8_keyframe(img.tolist(), mode_plan=plan, use_skip=use_skip)
    )
    got = np.array(f["y"], dtype=np.uint8)
    assert (got[0:16] == img[0:16]).all()
    # V_PRED MB replicates the row above it
    assert (got[16:32, 16:32] == got[15, 16:32]).all()
    # H_PRED MB replicates its left column
    assert (got[16:32, 32:48] == got[16:32, 31:32]).all()


@pytest.mark.parametrize(
    "kw",
    [
        {"filter_level": 20},
        {"filter_level": 40, "sharpness": 3},
        {"filter_level": 63},
        {"filter_level": 10, "filter_type": 1},
    ],
)
def test_loop_filter_runs_and_smooths(kw):
    img = _flat_image(seed=13)
    f = decode_vp8_keyframe(encode_vp8_keyframe(img.tolist(), **kw))
    got = np.array(f["y"], dtype=np.int32)
    delta = np.abs(got - img.astype(np.int32))
    assert delta.max() > 0  # real smoothing happened
    # smoothing, not corruption: adjusted pixels move TOWARD the
    # other side of their edge, never past the clamp range
    assert got.min() >= 0 and got.max() <= 255


def test_loop_filter_uniform_region_is_identity():
    img = np.full((64, 64), 180, dtype=np.uint8)
    f = decode_vp8_keyframe(
        encode_vp8_keyframe(img.tolist(), filter_level=40)
    )
    assert (np.array(f["y"], dtype=np.uint8) == img).all()


def test_spec_tables_substitution_point():
    """The machinery is table-agnostic: swap in an unrelated
    deterministic probability set (as the RFC constants would be) and
    the encoder/decoder pair still round-trips bit-exactly — the
    documented single substitution point for external interop."""
    from fame2pygen_spark.operators.vp8 import SPEC_TABLES, use_spec_tables

    img = _flat_image(seed=21)
    alt = {
        "token_probs": [
            [
                [
                    [max(1, min(254, (37 * (p + 2) * (b + 3) * (c + 1)
                                      + 11 * n) % 253 + 1))
                     for n in range(11)]
                    for c in range(3)
                ]
                for b in range(8)
            ]
            for p in range(4)
        ],
        "token_update_probs": [
            [[[max(1, (171 + p + b + c + n) % 255) for n in range(11)]
              for c in range(3)] for b in range(8)]
            for p in range(4)
        ],
        "kf_bmode_probs": [
            [[max(1, (a * 13 + l * 7 + n * 3) % 254 + 1)
              for n in range(9)] for l in range(10)]
            for a in range(10)
        ],
    }
    import numpy as np

    with use_spec_tables(alt):
        data = encode_vp8_keyframe(
            img.tolist(),
            update_probs=((0, 0, 0, 3, 50),),
            n_partitions=2,
        )
        f = decode_vp8_keyframe(data)
        assert (np.array(f["y"], dtype=np.uint8) == img).all()
    # restored afterwards
    assert SPEC_TABLES["kf_bmode_probs"][0][0][0] == 128
