"""Minimal MCAP reader — rosbag2's default storage since ROS 2 Iron.

Parses the MCAP container (magic, records, chunks) and yields decoded ROS 2
messages through the same CDR decoders as the sqlite3 path (io/rosbag2.py),
so ``tools/slam.py --bag run.mcap`` replays Iron+ recordings of the
reference workflow (README.md:129-134) without ROS.

Supported: uncompressed and zstd/lz4-compressed chunks (when the python
modules are importable — zstd bags fall back with a clear error otherwise),
schema/channel/message records, little-endian CDR payloads. Unsupported
record types are skipped per the MCAP forward-compatibility rule.
"""

from __future__ import annotations

import struct
from typing import Dict, Iterator, Optional, Tuple

from .rosbag2 import _DECODERS

_MAGIC = b"\x89MCAP0\r\n"

# record opcodes
_OP_HEADER = 0x01
_OP_FOOTER = 0x02
_OP_SCHEMA = 0x03
_OP_CHANNEL = 0x04
_OP_MESSAGE = 0x05
_OP_CHUNK = 0x06


def _read_prefixed(data: bytes, pos: int) -> Tuple[str, int]:
    (n,) = struct.unpack_from("<I", data, pos)
    s = data[pos + 4 : pos + 4 + n].decode("utf-8", errors="replace")
    return s, pos + 4 + n


def _iter_records(data: bytes, pos: int, end: int):
    """Yield (opcode, record_bytes) from a record stream."""
    while pos < end:
        op = data[pos]
        (length,) = struct.unpack_from("<Q", data, pos + 1)
        body = data[pos + 9 : pos + 9 + length]
        yield op, body
        pos += 9 + length
        if op == _OP_FOOTER:
            return


def _decompress(compression: str, blob: bytes, uncompressed_size: int) -> bytes:
    if compression == "":
        return blob
    if compression == "zstd":
        try:
            import zstandard

            return zstandard.ZstdDecompressor().decompress(
                blob, max_output_size=uncompressed_size
            )
        except ImportError:
            pass
        try:  # CPython 3.14+ stdlib
            from compression import zstd  # type: ignore

            return zstd.decompress(blob)
        except ImportError:
            raise RuntimeError(
                "zstd-compressed MCAP chunk but no zstd module available"
            )
    if compression == "lz4":
        try:
            import lz4.frame

            return lz4.frame.decompress(blob)
        except ImportError:
            raise RuntimeError(
                "lz4-compressed MCAP chunk but no lz4 module available"
            )
    raise RuntimeError(f"unknown MCAP chunk compression {compression!r}")


class McapReader:
    """Iterate decoded messages from an ``.mcap`` file in record order.

    Same interface as :class:`io.rosbag2.Rosbag2Reader`: ``topic_names()``
    and ``messages()`` yielding (topic, stamp_sec, decoded_message).
    """

    def __init__(self, path: str):
        with open(path, "rb") as f:
            self._data = f.read()
        if self._data[: len(_MAGIC)] != _MAGIC:
            raise ValueError(f"{path}: not an MCAP file")
        self._schemas: Dict[int, str] = {}  # schema_id -> name (msg type)
        self._channels: Dict[int, Tuple[str, str]] = {}  # id -> (topic, type)
        self._scan_channels()

    # -- structure -----------------------------------------------------------
    def _records(self):
        """All records, chunk contents inlined."""
        for op, body in _iter_records(
            self._data, len(_MAGIC), len(self._data) - len(_MAGIC)
        ):
            if op == _OP_CHUNK:
                # chunk: start(8) end(8) uncompressed_size(8) crc(4)
                #        compression(str) records_size(8) records
                (unc_size,) = struct.unpack_from("<Q", body, 16)
                comp, pos = _read_prefixed(body, 28)
                (rec_size,) = struct.unpack_from("<Q", body, pos)
                records = _decompress(
                    comp, body[pos + 8 : pos + 8 + rec_size], unc_size
                )
                yield from _iter_records(records, 0, len(records))
            else:
                yield op, body

    def _scan_channels(self):
        for op, body in self._records():
            if op == _OP_SCHEMA:
                (sid,) = struct.unpack_from("<H", body, 0)
                name, _ = _read_prefixed(body, 2)
                self._schemas[sid] = name
            elif op == _OP_CHANNEL:
                (cid,) = struct.unpack_from("<H", body, 0)
                (sid,) = struct.unpack_from("<H", body, 2)
                topic, _ = _read_prefixed(body, 4)
                self._channels[cid] = (topic, self._schemas.get(sid, ""))

    # -- public API ------------------------------------------------------------
    def topic_names(self) -> Dict[str, str]:
        return {topic: typ for topic, typ in self._channels.values()}

    def messages(
        self, topics: Optional[Tuple[str, ...]] = None
    ) -> Iterator[Tuple[str, float, Dict]]:
        wanted = {
            cid
            for cid, (topic, typ) in self._channels.items()
            if (topics is None or topic in topics)
            and _ros2_type(typ) in _DECODERS
        }
        for op, body in self._records():
            if op != _OP_MESSAGE:
                continue
            (cid,) = struct.unpack_from("<H", body, 0)
            if cid not in wanted:
                continue
            (log_time,) = struct.unpack_from("<Q", body, 6)
            topic, typ = self._channels[cid]
            decoded = _DECODERS[_ros2_type(typ)](body[22:])
            yield topic, log_time * 1e-9, decoded

    def close(self):
        self._data = b""


def _ros2_type(schema_name: str) -> str:
    """MCAP ROS 2 schema names use ``pkg/msg/Type`` (same as rosbag2) but
    some writers emit ``pkg/Type`` — normalize."""
    parts = schema_name.split("/")
    if len(parts) == 2:
        return f"{parts[0]}/msg/{parts[1]}"
    return schema_name


def open_bag(path: str):
    """Dispatch ``.mcap`` vs ``.db3`` by content magic; returns a reader with
    ``topic_names()`` + ``messages()``."""
    with open(path, "rb") as f:
        head = f.read(len(_MAGIC))
    if head == _MAGIC:
        return McapReader(path)
    from .rosbag2 import Rosbag2Reader

    return Rosbag2Reader(path)
