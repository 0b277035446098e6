"""Room geometry -> 16-int conditioning vector (domain layer L0).

Re-implements the behavior of the reference ``rooms.py`` (see
/root/reference/rooms.py:5-116) as a dataclass + vectorized-math design:

* A room is a quadrilateral floor plan (4 side lengths, 4 corner angles),
  a ceiling height, the center of the measurement grid, and an RT60.
* A measurement is addressed by (room, zone, array, loudspeaker l, mic m).
  Loudspeakers sit on a radius-150 cm circle (30 positions, reference
  rooms.py:52-54); microphones sit on either an 8x8 planar grid with 4 cm
  pitch (rooms.py:59-74) or two concentric 30-mic circles of radius 12/10 cm
  (rooms.py:76-92); zones B/C/D/A offset the mic array center by +-40 cm.
* ``embedding`` = [a, b, c, d, alpha, beta, gamma, delta, height,
  xl, yl, zl, xm, ym, zm, rt60] — 16 rounded ints (rooms.py:96-99).

Rounding matches Python/NumPy round-half-to-even semantics, which is what
the reference uses via the builtin ``round`` (it matters: several grid
centers are *.5 / *.25 valued).

Both a scalar host path (`UTSRoom.return_embedding`) and a batched
device path (`batched_embeddings`, pure jnp, vmap/jit-able) are provided.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax.numpy as jnp
import numpy as np

# Zone -> (dx, dy) offset of the mic-array center, in cm.
_ZONE_OFFSET = {
    "A": (-40.0, 0.0),
    "B": (40.0, 0.0),
    "C": (0.0, 40.0),
    "D": (0.0, -40.0),
    "E": (0.0, 0.0),
}

_SPEAKER_RADIUS = 150.0  # cm, loudspeaker ring radius
_N_SPEAKER_SLOTS = 30  # speakers sit at odd half-steps of a 30-slot ring
_SPEAKER_Z = 145.0  # cm
_MIC_Z = 145.0  # cm

_PLANAR_PITCH = 4.0  # cm between adjacent planar mics
_PLANAR_HALF = 14.0  # cm, half extent of the 8x8 grid
_CIRC_R_OUTER = 12.0  # cm, outer circular-array ring
_CIRC_R_STEP = 2.0  # cm, ring radius decrement per 30 mics
_CIRC_N_PER_RING = 30


def _round_half_even(x: float) -> int:
    """Round-half-to-even, identical to builtin round() on floats."""
    return int(np.round(x))


@dataclasses.dataclass(frozen=True)
class UTSRoom:
    """A measured room: quadrilateral floor plan + grid center + RT60.

    Field order mirrors the reference constructor
    (rooms.py:40-44): a, b, c, d, alpha, beta, gamma, delta, height,
    grid_center, rt60.
    """

    a: float
    b: float
    c: float
    d: float
    alpha: float
    beta: float
    gamma: float
    delta: float
    height: float
    grid_center: Sequence[float]
    rt60: float

    def room_vector(self) -> list[int]:
        """First 9 ints of the embedding (rooms.py:31-37)."""
        return [
            _round_half_even(v)
            for v in (
                self.a,
                self.b,
                self.c,
                self.d,
                self.alpha,
                self.beta,
                self.gamma,
                self.delta,
                self.height,
            )
        ]

    # Kept as an alias of the reference API name.
    def return_vector(self) -> list[int]:
        return self.room_vector()

    def speaker_position(self, l: int) -> tuple[int, int, int]:
        """Loudspeaker l (1-based) position on the radius-150 ring.

        Matches rooms.py:52-54: the inner trig result is rounded before the
        grid-center shift; callers round again after the shift.
        """
        theta = (2 * l - 1) * math.pi / (2 * _N_SPEAKER_SLOTS)
        cx, cy = self.grid_center
        xl = _round_half_even(-_SPEAKER_RADIUS * math.sin(theta)) + cx
        yl = _round_half_even(_SPEAKER_RADIUS * math.cos(theta)) + cy
        return xl, yl, _SPEAKER_Z

    def mic_position(self, zone: str, array: str, m: int) -> tuple[float, float, float]:
        """Microphone m (1-based) position for the given zone and array type.

        `array` is 'Planar' or 'Circular' (rooms.py:59-92).
        """
        ox, oy = _ZONE_OFFSET[zone]
        cx, cy = self.grid_center
        k = m - 1
        if array == "Planar":
            xm = -_PLANAR_HALF + _PLANAR_PITCH * (k % 8) + ox + cx
            ym = _PLANAR_HALF - _PLANAR_PITCH * (k // 8) + oy + cy
        elif array == "Circular":
            rm = _CIRC_R_OUTER - _CIRC_R_STEP * (k // _CIRC_N_PER_RING)
            theta = (k % _CIRC_N_PER_RING) * 2 * math.pi / _CIRC_N_PER_RING
            xm = -rm * math.sin(theta) + ox + cx
            ym = rm * math.cos(theta) + oy + cy
        else:
            raise ValueError(f"unknown array type: {array!r}")
        return xm, ym, _MIC_Z

    def get_m_l_position(self, characteristics: Sequence) -> list:
        """[xl, yl, zl, xm, ym, zm, rt60] for a parsed filename tuple.

        ``characteristics`` = [room, zone, array, l, m] as produced by the
        corpus filename parser (reference rooms.py:46-94).
        """
        zone, array = characteristics[1], characteristics[2]
        l, m = int(characteristics[3]), int(characteristics[4])
        xl, yl, zl = self.speaker_position(l)
        xm, ym, zm = self.mic_position(zone, array, m)
        return [
            _round_half_even(xl),
            _round_half_even(yl),
            _round_half_even(zl),
            _round_half_even(xm),
            _round_half_even(ym),
            _round_half_even(zm),
            self.rt60,
        ]

    def return_embedding(self, characteristics: Sequence) -> list:
        """Full 16-int conditioning vector (rooms.py:96-99)."""
        return self.room_vector() + self.get_m_l_position(characteristics)


# The six measured UTS rooms (constants from reference dataset.py:86-91).
ROOMS: dict[str, UTSRoom] = {
    "AnechoicRoom": UTSRoom(490, 722, 490, 722, 90, 90, 90, 90, 529, (245, 361), 45),
    "HemiAnechoicRoom": UTSRoom(490, 722, 490, 722, 90, 90, 90, 90, 529, (245, 361), 52),
    "SmallMeetingRoom": UTSRoom(355, 410, 401, 378, 96, 90, 85, 88, 300, (175.5, 205), 497),
    "MediumMeetingRoom": UTSRoom(736, 520, 650, 434.5, 81, 92, 98, 89, 300, (368, 217.5), 659),
    "LargeMeetingRoom": UTSRoom(994, 923, 1087, 1022, 81.4, 105, 81.3, 92.3, 300, (497, 486.25), 1281),
    "ShoeBoxRoom": UTSRoom(600, 1175, 600, 1175, 90, 90, 90, 90, 300, (300, 881.25), 667),
}

# Stable integer ids for the device path / per-room metric aggregation.
ROOM_NAMES: tuple[str, ...] = tuple(ROOMS)
ROOM_IDS: dict[str, int] = {name: i for i, name in enumerate(ROOM_NAMES)}
_ZONE_IDS = {z: i for i, z in enumerate("ABCDE")}
_ARRAY_IDS = {"Planar": 0, "Circular": 1}


def return_room(emb: Sequence[int]) -> str | None:
    """Reverse-lookup of the room name from an embedding's first entry.

    Mirrors reference rooms.py:102-116 (including its quirk that 'Small'
    etc. are short names and Hemi/Anechoic share side lengths so emb[0]=490
    maps to 'Anechoic').
    """
    side_a = int(emb[0])
    mapping = {490: "Anechoic", 355: "Small", 736: "Medium", 994: "Large", 600: "Box"}
    return mapping.get(side_a)


# ---------------------------------------------------------------------------
# Vectorized device path: batched embeddings as one jnp computation.
# ---------------------------------------------------------------------------

# Precomputed per-room constant rows: [a..height(9 rounded), cx, cy, rt60].
_ROOM_VEC_TABLE = np.stack(
    [
        np.array(
            ROOMS[name].room_vector()
            + [ROOMS[name].grid_center[0], ROOMS[name].grid_center[1], ROOMS[name].rt60],
            dtype=np.float64,
        )
        for name in ROOM_NAMES
    ]
)
_ZONE_OFFSET_TABLE = np.array([_ZONE_OFFSET[z] for z in "ABCDE"], dtype=np.float64)


def batched_embeddings(room_id, zone_id, array_id, l, m):
    """Compute (N, 16) int32 conditioning vectors entirely in jnp.

    Args are integer arrays of shape (N,): room_id in [0,6) per ROOM_IDS,
    zone_id in [0,5) per 'ABCDE', array_id 0=Planar / 1=Circular, l and m
    1-based speaker / mic indices.

    jnp.round is round-half-to-even, matching the scalar path.
    """
    table = jnp.asarray(_ROOM_VEC_TABLE)
    rows = table[room_id]  # (N, 12)
    room_vec = rows[:, :9]
    cx, cy, rt60 = rows[:, 9], rows[:, 10], rows[:, 11]

    theta_l = (2 * l - 1) * (math.pi / (2 * _N_SPEAKER_SLOTS))
    xl = jnp.round(-_SPEAKER_RADIUS * jnp.sin(theta_l)) + cx
    yl = jnp.round(_SPEAKER_RADIUS * jnp.cos(theta_l)) + cy

    off = jnp.asarray(_ZONE_OFFSET_TABLE)[zone_id]  # (N, 2)
    k = m - 1
    # Planar grid coordinates.
    xp = -_PLANAR_HALF + _PLANAR_PITCH * (k % 8)
    yp = _PLANAR_HALF - _PLANAR_PITCH * (k // 8)
    # Circular ring coordinates.
    rm = _CIRC_R_OUTER - _CIRC_R_STEP * (k // _CIRC_N_PER_RING)
    theta_m = (k % _CIRC_N_PER_RING) * (2 * math.pi / _CIRC_N_PER_RING)
    xc = -rm * jnp.sin(theta_m)
    yc = rm * jnp.cos(theta_m)

    is_circ = array_id == 1
    xm = jnp.where(is_circ, xc, xp) + off[:, 0] + cx
    ym = jnp.where(is_circ, yc, yp) + off[:, 1] + cy

    zl = jnp.full_like(xl, _SPEAKER_Z)
    zm = jnp.full_like(xm, _MIC_Z)
    pos = jnp.stack([xl, yl, zl, xm, ym, zm], axis=-1)
    emb = jnp.concatenate([room_vec, jnp.round(pos), rt60[:, None]], axis=-1)
    return emb.astype(jnp.int32)


def embed_descriptors(descriptors) -> np.ndarray:
    """(room, zone, array, l, m) descriptors -> (N, 16) int32 embeddings.

    The one conversion point shared by the corpus and the serving API.
    `array` must be exactly 'Planar' or 'Circular' (the parsed short names,
    not the on-disk '...MicrophoneArray' folder names).
    """
    for d in descriptors:
        if d[2] not in _ARRAY_IDS:
            raise ValueError(
                f"unknown array type {d[2]!r}; expected 'Planar' or 'Circular'"
            )
        if d[1] not in _ZONE_IDS:
            raise ValueError(f"unknown zone {d[1]!r}; expected one of A-E")
    room_id = np.array([ROOM_IDS[d[0]] for d in descriptors])
    zone_id = np.array([_ZONE_IDS[d[1]] for d in descriptors])
    array_id = np.array([_ARRAY_IDS[d[2]] for d in descriptors])
    l = np.array([int(d[3]) for d in descriptors])
    m = np.array([int(d[4]) for d in descriptors])
    return np.asarray(batched_embeddings(room_id, zone_id, array_id, l, m))


__all__ = [
    "UTSRoom",
    "ROOMS",
    "ROOM_NAMES",
    "ROOM_IDS",
    "return_room",
    "batched_embeddings",
    "embed_descriptors",
]
