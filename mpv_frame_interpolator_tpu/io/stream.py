"""Network/IPC stream backends (stream/stream_* analogs).

The reference opens media through pluggable stream backends (stream/
stream_file.c, stream_lavf.c network protocols).  A TPU serving host's
realistic transports are sockets carrying y4m from a decoder elsewhere on
the machine or rack:

    mfi tcp://127.0.0.1:9999      # y4m over TCP
    mfi unix:///run/decoder.sock  # y4m over a unix socket

Both are unseekable; the CLI wraps them in the spool cache (io/cache.py)
so seeking still works within the watched range, exactly like mpv's
demuxer cache over network streams.
"""

from __future__ import annotations

import socket
from typing import BinaryIO
from urllib.parse import urlparse

from mpv_frame_interpolator_tpu.utils import get_logger

log = get_logger("stream")

SCHEMES = ("tcp", "unix")


def is_stream_url(path: str) -> bool:
    return any(path.startswith(s + "://") for s in SCHEMES)


def open_stream(url: str, timeout: float = 30.0) -> BinaryIO:
    """Open a stream URL -> binary file object (read side)."""
    parsed = urlparse(url)
    if parsed.scheme == "tcp":
        if not parsed.hostname or not parsed.port:
            raise ValueError(f"tcp stream needs host:port, got {url!r}")
        sock = socket.create_connection(
            (parsed.hostname, parsed.port), timeout=timeout)
        sock.settimeout(None)
        log.info("connected to %s", url)
        return sock.makefile("rb")
    if parsed.scheme == "unix":
        path = parsed.path or parsed.netloc
        sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        sock.settimeout(timeout)
        sock.connect(path)
        sock.settimeout(None)
        log.info("connected to %s", url)
        return sock.makefile("rb")
    raise ValueError(f"unsupported stream scheme {parsed.scheme!r} "
                     f"(supported: {SCHEMES})")
