"""Replication polling state machine (S4-S6 live-source loop): state-file
parsing, 3/3/3 sequence paths, catch-up → tail transitions, checkpoint
resume, not-yet-published gaps, and the drop-dir bridge feeding the
existing augmented-diff source end-to-end."""

from __future__ import annotations

import gzip
import os

import pytest

from osmesa_spark.sources import polling as PL


def _publish(base, seq: int, payload: bytes, ext=".osc.gz"):
    rel = f"{seq:09d}"
    d = os.path.join(base, rel[0:3], rel[3:6])
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, rel[6:9] + ext), "wb") as f:
        f.write(gzip.compress(payload) if ext.endswith(".gz") else payload)


def _set_state(base, seq: int, style: str = "txt"):
    name = "state.txt" if style == "txt" else "state.yaml"
    body = f"sequence={seq}\n" if style == "txt" else f"---\nsequence: {seq}\n"
    with open(os.path.join(base, name), "w") as f:
        f.write(body)


class MemCheckpoint:
    def __init__(self):
        self.store = {}

    def save_checkpoint(self, proc, seq):
        self.store[proc] = seq

    def load_checkpoint(self, proc):
        return self.store.get(proc)


def test_sequence_path_scheme():
    ep = PL.ReplicationEndpoint("file:///x")
    assert ep.sequence_path(4007456) == "004/007/456.osc.gz"
    assert ep.sequence_path(7) == "000/000/007.osc.gz"


def test_state_parsing_txt_and_yaml(tmp_path):
    base = str(tmp_path)
    _set_state(base, 123, "txt")
    ep = PL.ReplicationEndpoint(f"file://{base}")
    assert ep.current_sequence() == 123
    _set_state(base, 456, "yaml")
    ep2 = PL.ReplicationEndpoint(f"file://{base}", state_file="state.yaml")
    assert ep2.current_sequence() == 456


def test_catchup_then_tail_and_resume(tmp_path):
    base = str(tmp_path)
    for s in range(1, 6):
        _publish(base, s, f"payload-{s}".encode())
    _set_state(base, 5)
    ep = PL.ReplicationEndpoint(f"file://{base}")
    seen = []
    ck = MemCheckpoint()
    p = PL.ReplicationPoller(
        endpoint=ep,
        process=lambda s, b: seen.append((s, b.decode())),
        proc_name="t",
        checkpoint=ck,
        start_sequence=2,
        batch_size=2,
    )
    n = p.run()
    assert n == 4  # sequences 2..5
    assert [s for s, _ in seen] == [2, 3, 4, 5]
    assert seen[0][1] == "payload-2"  # gunzipped transparently
    assert p.state == "TAILING"
    assert ck.load_checkpoint("t") == 5

    # resume: new poller over the same checkpoint store reprocesses nothing
    seen2 = []
    p2 = PL.ReplicationPoller(
        endpoint=ep, process=lambda s, b: seen2.append(s),
        proc_name="t", checkpoint=ck,
    )
    assert p2.run() == 0 and seen2 == []

    # a newly published sequence is picked up on the next run
    _publish(base, 6, b"payload-6")
    _set_state(base, 6)
    assert p2.run() == 1 and seen2 == [6]
    assert ck.load_checkpoint("t") == 6


def test_state_ahead_of_published_files(tmp_path):
    """state.txt advertises a sequence whose file isn't up yet — the poller
    must tail (not crash) and process it once it appears."""
    base = str(tmp_path)
    _publish(base, 1, b"a")
    _set_state(base, 2)  # 2 advertised but not published
    ep = PL.ReplicationEndpoint(f"file://{base}")
    seen = []
    p = PL.ReplicationPoller(
        endpoint=ep, process=lambda s, b: seen.append(s), start_sequence=1
    )
    assert p.run() == 1 and seen == [1]
    assert p.state == "TAILING"
    _publish(base, 2, b"b")
    assert p.run() == 1 and seen == [1, 2]


def test_not_ready_mid_batch_stays_tailing(tmp_path):
    """SequenceNotReady after done>0 within a batch must leave the poller
    TAILING — reverting to CATCH_UP would cost an extra state-file fetch +
    failed payload fetch on every tail cycle."""
    base = str(tmp_path)
    _publish(base, 1, b"a")
    _set_state(base, 2)  # 2 advertised, not yet published
    ep = PL.ReplicationEndpoint(f"file://{base}")
    seen = []
    p = PL.ReplicationPoller(
        endpoint=ep, process=lambda s, b: seen.append(s),
        start_sequence=1, batch_size=10,
    )
    assert p.step() == 0 and p.state == "CATCH_UP"  # INIT
    # one batch: processes 1, hits not-ready on 2 → must be TAILING
    assert p.step() == 1 and seen == [1]
    assert p.state == "TAILING"
    # once published, a tail step picks it up directly
    _publish(base, 2, b"b")
    p.state = "CATCH_UP"  # what run()'s tail loop does after the sleep
    assert p.step() == 1 and seen == [1, 2]


def test_end_sequence_bound(tmp_path):
    base = str(tmp_path)
    for s in range(1, 8):
        _publish(base, s, b"x")
    _set_state(base, 7)
    ep = PL.ReplicationEndpoint(f"file://{base}")
    seen = []
    p = PL.ReplicationPoller(
        endpoint=ep, process=lambda s, b: seen.append(s),
        start_sequence=1, end_sequence=4,
    )
    assert p.run() == 4 and seen == [1, 2, 3, 4]


def test_dropdir_bridge_feeds_augdiff_source(spark, tmp_path):
    """Poller → drop-dir → existing augmented-diff reader: the sequences
    polled from the fake endpoint arrive as stream-source rows."""
    from osmesa_spark.datagen import write_augdiff_dropdir
    from osmesa_spark.sources import replication as R

    # materialize fixture jsonl, then serve it from a replication tree
    src = str(tmp_path / "fixture")
    write_augdiff_dropdir(src, n_sequences=3, per_seq=10)
    base = str(tmp_path / "endpoint")
    os.makedirs(base)
    for seq in (1000, 1001, 1002):
        payload = open(os.path.join(src, f"{seq}.jsonl"), "rb").read()
        _publish(base, seq, payload, ext=".osc.gz")
    _set_state(base, 1002)

    drop = str(tmp_path / "drop")
    ep = PL.ReplicationEndpoint(f"file://{base}")
    p = PL.poll_to_dropdir(
        ep, drop, suffix=".jsonl", start_sequence=1000
    )
    assert p.run() == 3
    df = R.read_augmented_diffs(spark, drop)
    good, _ = R.split_errors(df)
    assert good.count() == 30
    assert set(
        r["sequence"] for r in good.select("sequence").distinct().collect()
    ) == {1000, 1001, 1002}


def test_http_endpoint_404_and_fetch(tmp_path):
    """Real HTTP transport: state + payload fetch over a local http.server;
    an unpublished sequence is a 404 → SequenceNotReady, not an error."""
    import http.server
    import threading

    base = str(tmp_path)
    _publish(base, 1, b"hello-http")
    _set_state(base, 1)
    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(  # noqa: E731
        *a, directory=base, **kw
    )
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        ep = PL.ReplicationEndpoint(f"http://127.0.0.1:{srv.server_port}")
        assert ep.current_sequence() == 1
        assert ep.fetch(1) == b"hello-http"  # gunzipped transparently
        with pytest.raises(PL.SequenceNotReady):
            ep.fetch(2)
    finally:
        srv.shutdown()
        srv.server_close()
