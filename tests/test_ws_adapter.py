"""WebSocket adapter (VERDICT r3 #8): a pytest-local mock WebSocket
server speaks RFC 6455 (handshake + binary frames), the bridge relays
into Spark's socket source, and the streamed decode must equal the
batch decode — the full connect/subscribe/stream startup of the
reference (ws/client.go:26-52, main.go:296-304) end to end."""

from __future__ import annotations

import socket
import threading
import time

from angelone_clickhouse_spark.sources.decoder import decode_frames, wire_to_ticks
from angelone_clickhouse_spark.sources.frames import frames_df, generate_frames
from angelone_clickhouse_spark.streaming.ingest import decode_tick_stream
from angelone_clickhouse_spark.streaming.ws_adapter import (
    OP_BINARY,
    OP_PING,
    read_frame_ws,
    ws_accept_key,
    ws_recv_frames,
    ws_send,
    ws_send_fragmented,
)

N_FRAMES = 300


def test_ws_recv_reassembles_fragmented_messages():
    """ADVICE r4: a server may legally split one message across FIN=0 +
    OP_CONT frames (RFC 6455 §5.4) with control frames interleaved;
    the receiver must yield ONE reassembled message, not per-fragment
    lines."""
    a, b = socket.socketpair()
    try:
        msg1 = bytes(range(200))
        ws_send_fragmented(a, msg1, n_fragments=3)  # 3-fragment binary
        # a ping interleaved INSIDE a fragmented message
        big = b"x" * 70000  # forces the 64-bit extended length too
        a.sendall(bytes([0x00 | OP_BINARY, len(big[:100])]) + big[:100])
        a.sendall(bytes([0x80 | OP_PING, 0]))  # FIN=1 ping, empty
        rest = big[100:]
        a.sendall(
            bytes([0x80 | 0x0, 127]) + len(rest).to_bytes(8, "big") + rest
        )
        ws_send(a, b"tail", opcode=OP_BINARY, mask=True)  # unfragmented
        a.shutdown(socket.SHUT_WR)
        got = list(ws_recv_frames(b))
        assert got == [(OP_BINARY, msg1), (OP_BINARY, big), (OP_BINARY, b"tail")]
        # the interleaved ping was answered with a pong on the reverse path
        h = a.recv(2)
        assert h[0] & 0x0F == 0xA
    finally:
        a.close()
        b.close()


class MockWsServer:
    """Single-connection RFC 6455 server: handshake, read the client's
    (masked) subscribe text frame, then push binary tick frames."""

    def __init__(self, frames: list[bytes]) -> None:
        self.frames = frames
        self.received_subscribe: str | None = None
        self._done = threading.Event()
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(1)
        self.port = self._srv.getsockname()[1]
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self) -> None:
        conn, _ = self._srv.accept()
        with conn:
            req = b""
            while b"\r\n\r\n" not in req:
                req += conn.recv(4096)
            key = next(
                ln.split(b":", 1)[1].strip()
                for ln in req.split(b"\r\n")
                if ln.lower().startswith(b"sec-websocket-key:")
            )
            conn.sendall(
                b"HTTP/1.1 101 Switching Protocols\r\n"
                b"Upgrade: websocket\r\nConnection: Upgrade\r\n"
                b"Sec-WebSocket-Accept: "
                + ws_accept_key(key.decode()).encode()
                + b"\r\n\r\n"
            )
            # first client frame: the subscribe JSON (masked text)
            for _opcode, payload in ws_recv_frames(conn):
                self.received_subscribe = payload.decode()
                break
            for i, f in enumerate(self.frames):  # server frames are unmasked
                if i % 7 == 3:  # legal per RFC 6455: fragment some messages
                    ws_send_fragmented(conn, f, n_fragments=2)
                else:
                    ws_send(conn, f, opcode=OP_BINARY, mask=False)
            self._done.wait(timeout=120)

    def stop(self) -> None:
        self._done.set()
        self._srv.close()
        self._thread.join(timeout=10)


def test_ws_stream_matches_batch_and_subscribes(spark, tmp_path):
    import json

    from angelone_clickhouse_spark.streaming.subscription import (
        build_subscribe_request,
    )

    frames = generate_frames(N_FRAMES, seed=13)
    sub_msg = build_subscribe_request(spark)
    mock = MockWsServer(frames)
    stream_frames, bridge = read_frame_ws(
        spark, "127.0.0.1", mock.port, subscribe_message=sub_msg
    )
    q = (
        decode_tick_stream(stream_frames)
        .writeStream.format("memory")
        .queryName("ws_ticks")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            if spark.table("ws_ticks").count() >= N_FRAMES:
                break
            time.sleep(1)
        got = sorted(map(tuple, spark.table("ws_ticks").collect()))
    finally:
        q.stop()
        bridge.stop()
        mock.stop()

    assert bridge.error is None, bridge.error
    # the mock received the exact reference subscribe contract
    assert mock.received_subscribe is not None
    assert json.loads(mock.received_subscribe) == json.loads(sub_msg)
    expected = sorted(
        map(
            tuple,
            wire_to_ticks(decode_frames(frames_df(spark, frames)))
            .dropDuplicates(["token", "sequence_number"])
            .collect(),
        )
    )
    assert len(got) == N_FRAMES
    assert got == expected
