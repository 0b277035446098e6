"""Unit tests for the room geometry / conditioning-vector layer (L0).

Golden vectors derived by hand from the reference formulas
(rooms.py:46-99) and the embedding sweep in rooms.py:119-136.
"""

import numpy as np

from unet_rir_tpu import rooms


def test_room_vector_large():
    large = rooms.ROOMS["LargeMeetingRoom"]
    # round() on 994, 923, 1087, 1022, 81.4, 105, 81.3, 92.3, 300
    assert large.room_vector() == [994, 923, 1087, 1022, 81, 105, 81, 92, 300]


def test_room_vector_medium_half_even():
    med = rooms.ROOMS["MediumMeetingRoom"]
    # d=434.5 -> round-half-even -> 434 (python round(434.5) == 434)
    assert med.room_vector()[3] == 434


def test_speaker_position_first():
    large = rooms.ROOMS["LargeMeetingRoom"]
    # l=1: theta=pi/60; xl=round(-150*sin(pi/60))+497; yl=round(150*cos(pi/60))+486.25
    import math

    xl, yl, zl = large.speaker_position(1)
    assert xl == round(-150 * math.sin(math.pi / 60)) + 497
    assert yl == round(150 * math.cos(math.pi / 60)) + 486.25
    assert zl == 145


def test_embedding_matches_reference_sweep():
    """Reproduce rooms.py:131-136: Large room, zone B, circular, L22, all m."""
    import math

    large = rooms.ROOMS["LargeMeetingRoom"]
    for m in (1, 2, 30, 31, 60, 64):
        emb = large.return_embedding(["LargeMeetingRoom", "B", "Circular", 22, m])
        assert len(emb) == 16
        assert emb[:9] == [994, 923, 1087, 1022, 81, 105, 81, 92, 300]
        # speaker l=22
        assert emb[9] == round(round(-150 * math.sin(43 * math.pi / 60)) + 497)
        assert emb[10] == round(round(150 * math.cos(43 * math.pi / 60)) + 486.25)
        assert emb[11] == 145 and emb[14] == 145
        # mic: circular zone B
        rm = 12 - 2 * ((m - 1) // 30)
        th = ((m - 1) % 30) * 2 * math.pi / 30
        assert emb[12] == round(-rm * math.sin(th) + 40 + 497)
        assert emb[13] == round(rm * math.cos(th) + 486.25)
        assert emb[15] == 1281


def test_planar_zones():
    """Exact golden mic positions per zone (reference rooms.py:59-74):
    zones offset the array center by +-40 cm; for SmallMeetingRoom, mic 1
    sits at x = -14 + ox + 175.5 (round-half-even of 161.5 -> 162 etc.)."""
    golden = {
        "E": (162, 219),
        "A": (122, 219),
        "B": (202, 219),
        "C": (162, 259),
        "D": (162, 179),
    }
    small = rooms.ROOMS["SmallMeetingRoom"]
    for zone, (x, y) in golden.items():
        emb = small.return_embedding(["SmallMeetingRoom", zone, "Planar", 1, 1])
        assert (emb[12], emb[13]) == (x, y), zone


def test_planar_grid_layout():
    """m walks an 8x8 grid: x advances 4cm per mic, y drops 4cm per row."""
    shoe = rooms.ROOMS["ShoeBoxRoom"]
    e1 = shoe.return_embedding(["ShoeBoxRoom", "E", "Planar", 1, 1])
    e2 = shoe.return_embedding(["ShoeBoxRoom", "E", "Planar", 1, 2])
    e9 = shoe.return_embedding(["ShoeBoxRoom", "E", "Planar", 1, 9])
    assert e2[12] - e1[12] == 4 and e2[13] == e1[13]
    assert e9[12] == e1[12] and e1[13] - e9[13] == 4


def test_return_room():
    assert rooms.return_room([355]) == "Small"
    assert rooms.return_room([994]) == "Large"
    assert rooms.return_room([600]) == "Box"
    assert rooms.return_room([123]) is None


def test_batched_matches_scalar():
    """The vectorized jnp path must agree with the scalar host path."""
    cases = []
    for name in rooms.ROOM_NAMES:
        for zone in "ABCDE":
            for array in ("Planar", "Circular"):
                for l, m in [(1, 1), (7, 13), (22, 60), (30, 64)]:
                    cases.append((name, zone, array, l, m))

    room_id = np.array([rooms.ROOM_IDS[c[0]] for c in cases])
    zone_id = np.array(["ABCDE".index(c[1]) for c in cases])
    array_id = np.array([0 if c[2] == "Planar" else 1 for c in cases])
    l = np.array([c[3] for c in cases])
    m = np.array([c[4] for c in cases])

    batched = np.asarray(rooms.batched_embeddings(room_id, zone_id, array_id, l, m))
    for i, (name, zone, array, li, mi) in enumerate(cases):
        scalar = rooms.ROOMS[name].return_embedding([name, zone, array, li, mi])
        np.testing.assert_array_equal(batched[i], np.array(scalar, dtype=np.int32), err_msg=str(cases[i]))
