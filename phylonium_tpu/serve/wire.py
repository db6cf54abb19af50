"""Framing for the device-server socket: JSON header + raw numpy bodies.

One message = magic, u32 header length, JSON header, then each array's
raw bytes back to back.  The header carries ``arrays`` specs as
``[dtype_str, shape]`` pairs so the receiver reconstructs views without
pickling (no code execution on received bytes; a version/magic check
rejects foreign traffic).  Big buffers move as single ``sendall``/
``recv_into`` calls — a local unix socket does ~GB/s, two orders of
magnitude above the tunnel this protocol exists to feed.
"""

from __future__ import annotations

import json
import socket
import struct

import numpy as np

MAGIC = b"PHYD1"
_MAX_HEADER = 1 << 20
# single-buffer cap: a 600 x 5 Mbp nibble panel chunk is < 1 GB; 8 GB
# rejects only protocol corruption, not any real workload
_MAX_BODY = 8 << 30


class WireError(ConnectionError):
    pass


def send_msg(sock: socket.socket, header: dict, arrays=()) -> None:
    arrays = [np.ascontiguousarray(a) for a in arrays]
    header = dict(header)
    header["arrays"] = [[str(a.dtype), list(a.shape)] for a in arrays]
    hdr = json.dumps(header).encode()
    sock.sendall(MAGIC + struct.pack("<I", len(hdr)) + hdr)
    for a in arrays:
        sock.sendall(memoryview(a).cast("B"))


def _recv_exact(sock: socket.socket, n: int) -> memoryview:
    buf = bytearray(n)
    view = memoryview(buf)
    got = 0
    while got < n:
        r = sock.recv_into(view[got:], n - got)
        if r == 0:
            raise WireError("device server connection closed mid-frame")
        got += r
    return memoryview(buf)


def recv_msg(sock: socket.socket) -> tuple[dict, list[np.ndarray]]:
    head = _recv_exact(sock, len(MAGIC) + 4)
    if bytes(head[: len(MAGIC)]) != MAGIC:
        raise WireError("bad magic on device-server socket")
    (hlen,) = struct.unpack("<I", head[len(MAGIC) :])
    if hlen > _MAX_HEADER:
        raise WireError(f"oversized header ({hlen} bytes)")
    header = json.loads(bytes(_recv_exact(sock, hlen)))
    arrays = []
    for dtype_str, shape in header.get("arrays", []):
        dt = np.dtype(dtype_str)
        count = int(np.prod(shape, dtype=np.int64)) if shape else 1
        nbytes = count * dt.itemsize
        if nbytes > _MAX_BODY:
            raise WireError(f"oversized body ({nbytes} bytes)")
        raw = _recv_exact(sock, nbytes)
        arrays.append(np.frombuffer(raw, dtype=dt).reshape(shape))
    return header, arrays
