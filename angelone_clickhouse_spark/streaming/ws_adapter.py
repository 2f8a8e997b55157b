"""WebSocket frame adapter (reference O2's real protocol, ws/client.go
:26-52, :90-112).

The engine's live source is Spark's TCP socket source reading
base64-frame lines (ingest.read_frame_socket). The reference's actual
feed is a WebSocket: this module closes that fidelity gap with a
minimal RFC 6455 client (stdlib sockets only — handshake, masked
client frames, ping/pong, close) and a BRIDGE that pumps WebSocket
binary frames into the exact line contract the socket source already
consumes. Swapping the TCP stand-in for the real feed is then the
promised one-line change:

    stream = decode_tick_stream(read_frame_socket(spark, host, port))
    # becomes
    stream, bridge = read_frame_ws(spark, ws_host, ws_port,
                                   subscribe_message=build_subscribe_request(spark))

Everything downstream (decode, dedup, sinks) is byte-identical.

Scale notes: the bridge is a driver-side control/io thread relaying a
single feed — the same shape as the reference's one WebSocket read
loop (ws/client.go:90-112). Throughput-critical deployments front the
feed with a replayable bus (Kafka) instead; the bridge exists for
protocol fidelity, not as the 100 TB ingest path (that is the
partitioned file/bus replay, BASELINE.md ingest section).
"""

from __future__ import annotations

import base64
import hashlib
import os
import socket
import threading

from pyspark.sql import DataFrame, SparkSession

WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"  # RFC 6455 §1.3

OP_CONT = 0x0
OP_TEXT = 0x1
OP_BINARY = 0x2
OP_CLOSE = 0x8
OP_PING = 0x9
OP_PONG = 0xA


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            return b""  # peer closed mid-frame
        buf += chunk
    return buf


def ws_accept_key(key: str) -> str:
    """Sec-WebSocket-Accept for a client key (RFC 6455 §4.2.2)."""
    return base64.b64encode(
        hashlib.sha1((key + WS_GUID).encode()).digest()
    ).decode()


def ws_client_connect(
    host: str, port: int, path: str = "/", timeout: float = 30.0
) -> socket.socket:
    """Open + upgrade a client connection (RFC 6455 §4.1): GET with
    Upgrade/Sec-WebSocket-Key headers, verify the 101 response echoes
    the SHA1-derived accept key."""
    s = socket.create_connection((host, port), timeout=timeout)
    key = base64.b64encode(os.urandom(16)).decode()
    req = (
        f"GET {path} HTTP/1.1\r\n"
        f"Host: {host}:{port}\r\n"
        "Upgrade: websocket\r\n"
        "Connection: Upgrade\r\n"
        f"Sec-WebSocket-Key: {key}\r\n"
        "Sec-WebSocket-Version: 13\r\n\r\n"
    )
    s.sendall(req.encode())
    resp = b""
    while b"\r\n\r\n" not in resp:
        chunk = s.recv(4096)
        if not chunk:
            raise ConnectionError("websocket handshake: peer closed")
        resp += chunk
    status = resp.split(b"\r\n", 1)[0]
    if b" 101" not in status:
        raise ConnectionError(f"websocket handshake rejected: {status!r}")
    if ws_accept_key(key).encode() not in resp:
        raise ConnectionError("websocket handshake: bad Sec-WebSocket-Accept")
    return s


def ws_send(
    sock: socket.socket,
    payload: bytes,
    opcode: int = OP_BINARY,
    mask: bool = True,
) -> None:
    """One FIN frame. Client frames MUST be masked, server frames MUST
    NOT (RFC 6455 §5.3) — the mock server in tests passes mask=False."""
    header = bytes([0x80 | opcode])
    n = len(payload)
    mask_bit = 0x80 if mask else 0x00
    if n < 126:
        header += bytes([mask_bit | n])
    elif n < 2**16:
        header += bytes([mask_bit | 126]) + n.to_bytes(2, "big")
    else:
        header += bytes([mask_bit | 127]) + n.to_bytes(8, "big")
    if mask:
        key = os.urandom(4)
        body = key + bytes(b ^ key[i % 4] for i, b in enumerate(payload))
    else:
        body = payload
    sock.sendall(header + body)


def ws_send_fragmented(
    sock: socket.socket,
    payload: bytes,
    n_fragments: int = 2,
    opcode: int = OP_BINARY,
    mask: bool = False,
) -> None:
    """Send one message split across ``n_fragments`` frames (first
    frame carries the opcode with FIN=0, the rest OP_CONT, last FIN=1
    — RFC 6455 §5.4). Used by the mock server in tests to exercise
    reassembly; servers send unmasked (mask=False default)."""
    n_fragments = max(1, min(n_fragments, len(payload) or 1))
    # even-split boundaries yield EXACTLY n_fragments parts (a
    # ceil-step slicing can emit fewer for many (len, n) combinations,
    # silently weakening a test that asked for n-fragment reassembly)
    bounds = [len(payload) * i // n_fragments for i in range(n_fragments + 1)]
    parts = (
        [payload[bounds[i] : bounds[i + 1]] for i in range(n_fragments)]
        if payload
        else [b""]
    )
    for i, part in enumerate(parts):
        fin = 0x80 if i == len(parts) - 1 else 0x00
        op = opcode if i == 0 else OP_CONT
        header = bytes([fin | op])
        n = len(part)
        mask_bit = 0x80 if mask else 0x00
        if n < 126:
            header += bytes([mask_bit | n])
        elif n < 2**16:
            header += bytes([mask_bit | 126]) + n.to_bytes(2, "big")
        else:
            header += bytes([mask_bit | 127]) + n.to_bytes(8, "big")
        if mask:
            key = os.urandom(4)
            body = key + bytes(b ^ key[j % 4] for j, b in enumerate(part))
        else:
            body = part
        sock.sendall(header + body)


def ws_recv_frames(sock: socket.socket):
    """Yield (opcode, payload) for incoming data MESSAGES until
    close/EOF. Handles masked and unmasked frames, answers pings,
    unwraps extended lengths; control frames are consumed, not
    yielded. Fragmented messages (FIN=0 data frame + OP_CONT
    continuations, RFC 6455 §5.4) are reassembled and yielded once,
    under the initial opcode — control frames may interleave between
    fragments and are handled in place."""
    frag_opcode: int | None = None
    frag_parts: list[bytes] = []
    while True:
        h = _recv_exact(sock, 2)
        if len(h) < 2:
            return
        fin = bool(h[0] & 0x80)
        opcode = h[0] & 0x0F
        masked = bool(h[1] & 0x80)
        n = h[1] & 0x7F
        if n == 126:
            n = int.from_bytes(_recv_exact(sock, 2), "big")
        elif n == 127:
            n = int.from_bytes(_recv_exact(sock, 8), "big")
        key = _recv_exact(sock, 4) if masked else None
        payload = _recv_exact(sock, n) if n else b""
        if masked and payload:
            payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
        if opcode == OP_CLOSE:
            return
        if opcode == OP_PING:
            ws_send(sock, payload, opcode=OP_PONG)
            continue
        if opcode == OP_PONG:
            continue
        if opcode == OP_CONT:
            if frag_opcode is None:
                raise ConnectionError(
                    "websocket: continuation frame with no message in flight"
                )
            frag_parts.append(payload)
            if fin:
                msg = b"".join(frag_parts)
                op = frag_opcode
                frag_opcode, frag_parts = None, []
                yield op, msg
            continue
        # data frame (text/binary)
        if frag_opcode is not None:
            raise ConnectionError(
                "websocket: new data frame interleaved inside a "
                "fragmented message"
            )
        if fin:
            yield opcode, payload
        else:
            frag_opcode, frag_parts = opcode, [payload]


class WsFrameBridge:
    """Pump: WebSocket binary frames -> base64 lines on a local TCP
    port, i.e. exactly what ``read_frame_socket`` consumes. Sends an
    optional subscribe control message (the O3 JSON contract,
    streaming/subscription.py) as the first text frame — mirroring the
    reference's connect-then-subscribe startup (main.go:296-304)."""

    def __init__(
        self,
        ws_host: str,
        ws_port: int,
        path: str = "/",
        subscribe_message: str | None = None,
        linger_secs: float | None = None,
    ) -> None:
        """``linger_secs``: how long to hold the TCP side open after the
        WebSocket feed ends (the socket source treats EOF as source
        failure). Default None = until ``stop()`` is called."""
        self.ws_host, self.ws_port, self.path = ws_host, ws_port, path
        self.subscribe_message = subscribe_message
        self.linger_secs = linger_secs
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(1)
        self._done = threading.Event()
        self._thread: threading.Thread | None = None
        self.error: BaseException | None = None

    @property
    def tcp_port(self) -> int:
        return self._srv.getsockname()[1]

    def _pump(self) -> None:
        try:
            conn, _ = self._srv.accept()  # Spark's socket source
            with conn:
                ws = ws_client_connect(self.ws_host, self.ws_port, self.path)
                with ws:
                    if self.subscribe_message is not None:
                        ws_send(
                            ws,
                            self.subscribe_message.encode(),
                            opcode=OP_TEXT,
                        )
                    for _opcode, payload in ws_recv_frames(ws):
                        conn.sendall(base64.b64encode(payload) + b"\n")
                    # feed ended: hold the TCP side open — the socket
                    # source treats EOF as source failure
                    self._done.wait(timeout=self.linger_secs)
        except BaseException as e:  # noqa: BLE001 — surfaced via .error
            self.error = e

    def start(self) -> "WsFrameBridge":
        self._thread = threading.Thread(target=self._pump, daemon=True)
        self._thread.start()
        return self

    # context-manager form so a raising caller can't leak the pump
    # thread / relay port when linger_secs=None (wait-until-stop)
    def __enter__(self) -> "WsFrameBridge":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    def stop(self) -> None:
        """Release the pump and close the relay port. A pump error is
        logged here (it otherwise only surfaces if the caller polls
        ``.error``) — logged, not raised, so shutdown always completes;
        callers that must fail hard check ``.error`` after stop()."""
        self._done.set()
        self._srv.close()
        if self._thread is not None:
            self._thread.join(timeout=10)
        if self.error is not None:
            import logging

            logging.getLogger(__name__).warning(
                "WsFrameBridge pump error: %r", self.error
            )


def read_frame_ws(
    spark: SparkSession,
    ws_host: str,
    ws_port: int,
    path: str = "/",
    subscribe_message: str | None = None,
) -> tuple[DataFrame, WsFrameBridge]:
    """The one-line swap promised at ingest.py:48: a streaming frame
    DataFrame fed by a real WebSocket, plus the bridge handle (call
    ``.stop()`` when the query ends)."""
    from angelone_clickhouse_spark.streaming.ingest import read_frame_socket

    bridge = WsFrameBridge(
        ws_host, ws_port, path, subscribe_message=subscribe_message
    ).start()
    return read_frame_socket(spark, "127.0.0.1", bridge.tcp_port), bridge
