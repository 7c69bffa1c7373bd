"""Hand-assemble the golden Waymo TFRecord byte fixture.

Every byte below is written from the PUBLIC waymo-open-dataset schema
(dataset.proto / label.proto, Apache-2.0), independently of
findnpropagate_tpu.datasets.waymo_proto — no import of the module under
test. The committed fixture pins the module's field-number maps by bytes:
a transposed id in the decoder can no longer cancel against the in-module
encoder (which is how the round-4 Box.length/width transposition survived
the round-trip tests).

Schema transcription used here (field numbers as literals in the emit
calls):
  Frame        { context=1; timestamp_micros=2; pose=3; images=4;
                 lasers=5; laser_labels=6 }
  Context      { name=1; camera_calibrations=2; laser_calibrations=3 }
  LaserCalibration { name=1; beam_inclinations=2 (packed double);
                 beam_inclination_min=3; beam_inclination_max=4;
                 extrinsic=5 }
  Transform    { transform=1 (packed double, 16 row-major) }
  Laser        { name=1; ri_return1=2; ri_return2=3 }
  RangeImage   { range_image_compressed=2; range_image_pose_compressed=4 }
  MatrixFloat  { data=1 (packed float); shape=2 }
  MatrixShape  { dims=1 (packed int32) }
  Label        { box=1; metadata=2; type=3; id=4;
                 detection_difficulty_level=5; tracking_difficulty_level=6;
                 num_lidar_points_in_box=7 }
  Label.Box    { center_x=1; center_y=2; center_z=3; length=4 ("dim x");
                 width=5 ("dim y"); height=6; heading=7 }
  Label.Metadata { speed_x=1; speed_y=2; accel_x=3; accel_y=4 }

Run: python tests/fixtures/make_waymo_golden.py  (rewrites
tests/fixtures/waymo_golden.tfrecord + waymo_golden_expected.json)
"""

from __future__ import annotations

import json
import struct
import zlib
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent


# ---- minimal protobuf wire emitters (hand-rolled, no shared code) --------

def tag(field: int, wire: int) -> bytes:
    return varint((field << 3) | wire)


def varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def f_varint(field: int, v: int) -> bytes:
    return tag(field, 0) + varint(v)


def f_len(field: int, payload: bytes) -> bytes:
    return tag(field, 2) + varint(len(payload)) + payload


def f_double(field: int, v: float) -> bytes:
    return tag(field, 1) + struct.pack("<d", v)


def packed_doubles(field: int, vals) -> bytes:
    return f_len(field, b"".join(struct.pack("<d", v) for v in vals))


def packed_floats(field: int, vals) -> bytes:
    return f_len(field, b"".join(struct.pack("<f", float(v))
                                 for v in vals))


def packed_varints(field: int, vals) -> bytes:
    return f_len(field, b"".join(varint(int(v)) for v in vals))


def matrix_float(arr: np.ndarray) -> bytes:
    return (packed_floats(1, arr.reshape(-1).tolist())
            + f_len(2, packed_varints(1, arr.shape)))


def transform(mat4: np.ndarray) -> bytes:
    return packed_doubles(1, np.asarray(mat4).reshape(-1).tolist())


# ---- fixture content ------------------------------------------------------

def build_frame() -> tuple[bytes, dict]:
    rng_rows, rng_cols = 3, 4           # 3 beams x 4 azimuth columns

    # TOP laser calibration: identity rotation, z offset 1.8
    extrinsic = np.eye(4)
    extrinsic[2, 3] = 1.8
    inclinations = [-0.30, -0.10, 0.12]

    cal = (f_varint(1, 1)                               # name = TOP (1)
           + packed_doubles(2, inclinations)
           + f_double(3, -0.30) + f_double(4, 0.12)
           + f_len(5, transform(extrinsic)))

    context = f_len(1, b"golden_segment_0001") + f_len(3, cal)

    # range image (rows, cols, 4): channels range/intensity/elongation/nlz
    ri = np.zeros((rng_rows, rng_cols, 4), np.float32)
    ranges = np.array([[5.0, 10.0, 0.0, 7.5],
                       [20.0, 0.0, 3.25, 60.0],
                       [1.5, 2.5, 12.0, 0.0]], np.float32)
    ri[:, :, 0] = ranges
    ri[:, :, 1] = 0.5
    ri[:, :, 2] = 0.25
    ri[1, 3, 3] = 1.0                   # one no-label-zone return

    # per-column pose: identity (MatrixFloat rows x cols x 6)
    ri_pose = np.zeros((rng_rows, rng_cols, 6), np.float32)

    range_image = (f_len(2, zlib.compress(matrix_float(ri)))
                   + f_len(4, zlib.compress(matrix_float(ri_pose))))
    laser = f_varint(1, 1) + f_len(2, range_image)      # TOP, return 1

    # vehicle pose: translation (100, -50, 3)
    pose = np.eye(4)
    pose[:3, 3] = [100.0, -50.0, 3.0]

    def label(cx, cy, cz, length, width, height, heading, typ, oid,
              diff, npts, speed):
        box = (f_double(1, cx) + f_double(2, cy) + f_double(3, cz)
               + f_double(4, length) + f_double(5, width)
               + f_double(6, height) + f_double(7, heading))
        meta = (f_double(1, speed[0]) + f_double(2, speed[1])
                + f_double(3, 0.0) + f_double(4, 0.0))
        return (f_len(1, box) + f_len(2, meta) + f_varint(3, typ)
                + f_len(4, oid.encode()) + f_varint(5, diff)
                + f_varint(7, npts))

    # TYPE_VEHICLE=1, TYPE_PEDESTRIAN=2 (label.proto Label.Type)
    lab1 = label(10.0, -2.0, 0.5, 4.5, 1.8, 1.5, 0.3, 1, "veh_001",
                 1, 25, (3.0, -1.0))
    lab2 = label(-6.0, 4.0, 0.9, 0.7, 0.6, 1.7, -1.2, 2, "ped_007",
                 2, 8, (0.5, 0.5))

    frame = (f_len(1, context) + f_varint(2, 1234567890123456)
             + f_len(3, transform(pose)) + f_len(5, laser)
             + f_len(6, lab1) + f_len(6, lab2))

    expected = {
        "context_name": "golden_segment_0001",
        "timestamp_micros": 1234567890123456,
        "pose_translation": [100.0, -50.0, 3.0],
        "beam_inclinations": inclinations,
        "extrinsic_z": 1.8,
        "range_image_shape": [rng_rows, rng_cols, 4],
        "ranges": ranges.tolist(),
        "labels": [
            {"center": [10.0, -2.0, 0.5], "lwh": [4.5, 1.8, 1.5],
             "heading": 0.3, "type": 1, "id": "veh_001",
             "difficulty": 1, "num_points": 25, "speed": [3.0, -1.0]},
            {"center": [-6.0, 4.0, 0.9], "lwh": [0.7, 0.6, 1.7],
             "heading": -1.2, "type": 2, "id": "ped_007",
             "difficulty": 2, "num_points": 8, "speed": [0.5, 0.5]},
        ],
    }
    return frame, expected


# ---- TFRecord framing (uint64 len, masked crc of len, payload, crc) ------

def crc32c(data: bytes) -> int:
    table = []
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ (0x82F63B78 if crc & 1 else 0)
        table.append(crc)
    crc = 0xFFFFFFFF
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def masked(crc: int) -> int:
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def tfrecord(payload: bytes) -> bytes:
    hdr = struct.pack("<Q", len(payload))
    return (hdr + struct.pack("<I", masked(crc32c(hdr))) + payload
            + struct.pack("<I", masked(crc32c(payload))))


def main():
    frame, expected = build_frame()
    (HERE / "waymo_golden.tfrecord").write_bytes(tfrecord(frame))
    (HERE / "waymo_golden_expected.json").write_text(
        json.dumps(expected, indent=1))
    print("wrote", len(frame), "frame bytes")


if __name__ == "__main__":
    main()
