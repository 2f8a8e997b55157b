"""Live network frame source (reference O2: the WebSocket read loop,
ws/client.go:90-112) via Spark's TCP socket source: a local server
emits base64 frame lines; the streamed decode must equal the batch
decode of the same frames."""

from __future__ import annotations

import base64
import socket
import threading
import time

from angelone_clickhouse_spark.sources.decoder import decode_frames, wire_to_ticks
from angelone_clickhouse_spark.sources.frames import frames_df, generate_frames
from angelone_clickhouse_spark.streaming.ingest import (
    decode_tick_stream,
    read_frame_socket,
)

N_FRAMES = 300


def test_socket_frames_match_batch(spark, tmp_path):
    frames = generate_frames(N_FRAMES, seed=11)
    done = threading.Event()

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def serve():
        conn, _ = srv.accept()
        with conn:
            conn.sendall(b"".join(base64.b64encode(f) + b"\n" for f in frames))
            # hold the connection open until the query stops — the
            # socket source treats EOF as source failure
            done.wait(timeout=120)

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    stream = decode_tick_stream(read_frame_socket(spark, "127.0.0.1", port))
    q = (
        stream.writeStream.format("memory")
        .queryName("socket_ticks")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            if spark.table("socket_ticks").count() >= N_FRAMES:
                break
            time.sleep(1)
        got = sorted(map(tuple, spark.table("socket_ticks").collect()))
    finally:
        q.stop()
        done.set()
        srv.close()
        t.join(timeout=10)

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
