"""Minimal RFC 6455 WebSocket client (stdlib-only) — the transport under the
Chrome DevTools Protocol client in :mod:`scrape_spark.sources.live`.

The reference drives headless Chrome through github.com/efixler/headless,
which speaks CDP over a WebSocket (internal/headless/fetch_client.go:26-41).
This sandbox has no websocket package, so the client implements the RFC 6455
subset CDP needs: the opening handshake (Sec-WebSocket-Key/-Accept), masked
client→server text frames, unmasked server→client frames with 7/16/64-bit
payload lengths, fragmentation reassembly, ping→pong, and the closing
handshake. No extensions, no subprotocols — Chrome's /devtools endpoints
negotiate neither.
"""

from __future__ import annotations

import base64
import hashlib
import os
import socket
import struct
from urllib.parse import urlparse

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

OP_CONT = 0x0
OP_TEXT = 0x1
OP_BINARY = 0x2
OP_CLOSE = 0x8
OP_PING = 0x9
OP_PONG = 0xA


class WebSocketError(OSError):
    pass


class WebSocketClosed(WebSocketError):
    """The peer completed (or initiated) the closing handshake."""


class WebSocket:
    """A blocking client WebSocket. Not thread-safe; CDP sessions are
    single-threaded per tab (the reference serializes per-tab use the same
    way: one AcquireTab per Get)."""

    def __init__(self, sock: socket.socket):
        self._sock = sock
        self._buf = b""
        self._closed = False

    # -- connection -----------------------------------------------------------

    @classmethod
    def connect(cls, url: str, timeout: float = 30.0) -> "WebSocket":
        """Open ``ws://host:port/path`` and perform the RFC 6455 §4 client
        handshake. ``wss://`` is rejected — CDP endpoints are loopback
        plaintext (Chrome only serves /devtools on 127.0.0.1)."""
        u = urlparse(url)
        if u.scheme != "ws":
            raise WebSocketError(f"unsupported scheme {u.scheme!r} (only ws://)")
        host = u.hostname or "127.0.0.1"
        port = u.port or 80
        path = u.path or "/"
        if u.query:
            path += "?" + u.query
        key = base64.b64encode(os.urandom(16)).decode("ascii")
        sock = socket.create_connection((host, port), timeout=timeout)
        try:
            req = (
                f"GET {path} HTTP/1.1\r\n"
                f"Host: {host}:{port}\r\n"
                "Upgrade: websocket\r\n"
                "Connection: Upgrade\r\n"
                f"Sec-WebSocket-Key: {key}\r\n"
                "Sec-WebSocket-Version: 13\r\n"
                "\r\n"
            )
            sock.sendall(req.encode("ascii"))
            ws = cls(sock)
            status, headers = ws._read_http_response()
            if status != 101:
                raise WebSocketError(f"handshake rejected: HTTP {status}")
            expect = base64.b64encode(
                hashlib.sha1((key + _WS_GUID).encode("ascii")).digest()
            ).decode("ascii")
            got = headers.get("sec-websocket-accept")
            if got != expect:
                raise WebSocketError(
                    f"bad Sec-WebSocket-Accept: {got!r} (want {expect!r})"
                )
            return ws
        except BaseException:
            sock.close()
            raise

    def _read_http_response(self) -> tuple[int, dict[str, str]]:
        data = b""
        while b"\r\n\r\n" not in data:
            chunk = self._sock.recv(4096)
            if not chunk:
                raise WebSocketError("connection closed during handshake")
            data += chunk
            if len(data) > 65536:
                raise WebSocketError("oversized handshake response")
        head, rest = data.split(b"\r\n\r\n", 1)
        self._buf = rest  # frames may ride the same segment
        lines = head.decode("latin-1").split("\r\n")
        try:
            status = int(lines[0].split(" ", 2)[1])
        except (IndexError, ValueError) as e:
            raise WebSocketError(f"malformed status line {lines[0]!r}") from e
        headers: dict[str, str] = {}
        for line in lines[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        return status, headers

    # -- frame I/O ------------------------------------------------------------

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self._sock.recv(max(4096, n - len(self._buf)))
            if not chunk:
                raise WebSocketError("connection closed mid-frame")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _read_frame(self) -> tuple[int, bool, bytes]:
        b1, b2 = self._read_exact(2)
        fin = bool(b1 & 0x80)
        opcode = b1 & 0x0F
        masked = bool(b2 & 0x80)
        length = b2 & 0x7F
        if length == 126:
            (length,) = struct.unpack(">H", self._read_exact(2))
        elif length == 127:
            (length,) = struct.unpack(">Q", self._read_exact(8))
        if masked:  # server frames MUST NOT be masked (RFC 6455 §5.1)...
            mask = self._read_exact(4)
            payload = bytes(
                b ^ mask[i % 4] for i, b in enumerate(self._read_exact(length))
            )  # ...but tolerate it: unmask rather than fail the session
        else:
            payload = self._read_exact(length)
        return opcode, fin, payload

    def _send_frame(self, opcode: int, payload: bytes) -> None:
        if self._closed:
            raise WebSocketClosed("send on closed WebSocket")
        mask = os.urandom(4)
        n = len(payload)
        if n < 126:
            header = struct.pack(">BB", 0x80 | opcode, 0x80 | n)
        elif n < 1 << 16:
            header = struct.pack(">BBH", 0x80 | opcode, 0x80 | 126, n)
        else:
            header = struct.pack(">BBQ", 0x80 | opcode, 0x80 | 127, n)
        masked = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
        self._sock.sendall(header + mask + masked)

    # -- public API -----------------------------------------------------------

    def send_text(self, text: str) -> None:
        self._send_frame(OP_TEXT, text.encode("utf-8"))

    def recv_text(self, timeout: float | None = None) -> str:
        """Next complete text/binary message as str. Handles continuation
        frames and answers pings transparently."""
        if timeout is not None:
            self._sock.settimeout(timeout)
        parts: list[bytes] = []
        while True:
            opcode, fin, payload = self._read_frame()
            if opcode == OP_PING:
                self._send_frame(OP_PONG, payload)
                continue
            if opcode == OP_PONG:
                continue
            if opcode == OP_CLOSE:
                if not self._closed:
                    try:
                        self._send_frame(OP_CLOSE, payload[:2])
                    except OSError:
                        pass
                    self._closed = True
                raise WebSocketClosed("peer closed the WebSocket")
            if opcode in (OP_TEXT, OP_BINARY) or (opcode == OP_CONT and parts):
                parts.append(payload)
                if fin:
                    return b"".join(parts).decode("utf-8")
            else:
                raise WebSocketError(f"unexpected opcode {opcode:#x}")

    def close(self) -> None:
        if not self._closed:
            self._closed = True
            try:
                mask = os.urandom(4)
                payload = struct.pack(">H", 1000)
                header = struct.pack(">BB", 0x80 | OP_CLOSE, 0x80 | len(payload))
                masked = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
                self._sock.sendall(header + mask + masked)
            except OSError:
                pass
        try:
            self._sock.close()
        except OSError:
            pass

    def __enter__(self) -> "WebSocket":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
