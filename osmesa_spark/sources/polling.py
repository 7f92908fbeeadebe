"""Replication polling state machine — the reference's live-source loop.

The reference's streaming sources (vectorpipe `Source.Changesets` /
`Source.Changes` / `Source.AugmentedDiffs`; option surface documented at
`src/apps/.../StreamingChangesetMetadataUpdater.scala:81-100`) poll an OSM
replication endpoint: a state file advertises the newest published sequence,
numbered payload files live at zero-padded `NNN/NNN/NNN.<ext>` paths, and
the consumer walks sequences from its checkpoint to the advertised head,
then tails. This module rebuilds that loop engine-side:

  * `ReplicationEndpoint` — URI access (http(s)://, s3 via http, file://
    for tests) + state parsing (`state.txt` `sequence=N` / `state.yaml`
    `sequence: N`) + the 3/3/3 zero-padded sequence path scheme + gzip
    transparent decode. Bounded retry with backoff on transient errors;
    a not-yet-published sequence (404) is a distinct NOT_READY signal.
  * `ReplicationPoller` — the state machine: INIT (resolve start from an
    explicit StartSequence or the stored checkpoint) → CATCH_UP (walk
    sequences up to the advertised head, at most `batch_size` per step)
    → TAILING (re-read state, sleep `poll_interval` when caught up);
    checkpoint saved after every successfully processed sequence
    (DbUtils.saveLocations parity — accepts any object with
    save_checkpoint/load_checkpoint, e.g. sinks.jdbc.JdbcStatsSink).
  * `poll_to_dropdir` — the Spark bridge: downloaded sequence payloads
    land in the drop-dir that `sources.replication`'s Structured Streaming
    file source watches, so the driver-side poller feeds a fully
    distributed stream without any custom Source implementation. Driver
    IO is one file per sequence (bounded, tiny); all parsing/compute
    happens in executors via the existing stream.
"""

from __future__ import annotations

import gzip
import os
import re
import time
import urllib.error
import urllib.request
from collections.abc import Callable
from dataclasses import dataclass, field

MAX_RETRIES = 3
RETRY_BACKOFF_S = 0.5


class SequenceNotReady(Exception):
    """The endpoint has not published this sequence yet (HTTP 404 family) —
    the poller treats this as 'caught up', not an error."""


@dataclass
class ReplicationEndpoint:
    base_uri: str  # e.g. https://planet.osm.org/replication/minute/
    extension: str = ".osc.gz"
    state_file: str = "state.txt"

    def sequence_path(self, sequence: int) -> str:
        """Zero-padded 9-digit 3/3/3 path: 4007456 → 004/007/456."""
        s = f"{sequence:09d}"
        return f"{s[0:3]}/{s[3:6]}/{s[6:9]}{self.extension}"

    def _get(self, rel_path: str) -> bytes:
        uri = self.base_uri.rstrip("/") + "/" + rel_path
        last: Exception | None = None
        for attempt in range(MAX_RETRIES):
            try:
                with urllib.request.urlopen(uri) as resp:
                    return resp.read()
            except urllib.error.HTTPError as e:
                if e.code == 404:
                    raise SequenceNotReady(uri) from e
                last = e
            except FileNotFoundError as e:  # file:// 404 equivalent
                raise SequenceNotReady(uri) from e
            except urllib.error.URLError as e:
                if isinstance(e.reason, FileNotFoundError):
                    raise SequenceNotReady(uri) from e
                last = e
            time.sleep(RETRY_BACKOFF_S * (attempt + 1))
        raise last  # type: ignore[misc]

    def current_sequence(self) -> int:
        """Newest published sequence per the endpoint's state file
        (`sequence=N` in state.txt, `sequence: N` in state.yaml)."""
        text = self._get(self.state_file).decode("utf-8", "replace")
        m = re.search(r"sequence\s*[:=]\s*(\d+)", text)
        if not m:
            raise ValueError(f"unparseable state file: {text[:200]!r}")
        return int(m.group(1))

    def fetch(self, sequence: int) -> bytes:
        """Payload bytes for a sequence, gunzipped when gzip-compressed.
        Raises SequenceNotReady when the file isn't published yet."""
        raw = self._get(self.sequence_path(sequence))
        if raw[:2] == b"\x1f\x8b":
            return gzip.decompress(raw)
        return raw


@dataclass
class ReplicationPoller:
    """INIT → CATCH_UP → TAILING over a replication endpoint.

    `process(sequence, payload)` is invoked once per sequence in order;
    the checkpoint advances only after it returns, so a crash replays the
    in-flight sequence (at-least-once; the downstream upsert sinks'
    sequence-overlap guard makes the replay a no-op — the same end-to-end
    idempotence contract the reference relies on)."""

    endpoint: ReplicationEndpoint
    process: Callable[[int, bytes], None]
    proc_name: str = "replication"
    checkpoint: object | None = None  # save_checkpoint/load_checkpoint
    start_sequence: int | None = None
    end_sequence: int | None = None
    batch_size: int = 100
    poll_interval_s: float = 1.0
    state: str = field(default="INIT", init=False)
    position: int | None = field(default=None, init=False)  # last processed

    def _resolve_start(self) -> int:
        if self.checkpoint is not None:
            stored = self.checkpoint.load_checkpoint(self.proc_name)
            if stored is not None:
                return stored + 1
        if self.start_sequence is not None:
            return self.start_sequence
        # default: tail from the current head (reference default behavior)
        return self.endpoint.current_sequence()

    def _commit(self, sequence: int) -> None:
        self.position = sequence
        if self.checkpoint is not None:
            self.checkpoint.save_checkpoint(self.proc_name, sequence)

    def step(self) -> int:
        """One state-machine step; returns the number of sequences
        processed (0 when caught up / finished)."""
        if self.state == "INIT":
            self.position = self._resolve_start() - 1
            self.state = "CATCH_UP"
            return 0
        head = self.endpoint.current_sequence()
        if self.end_sequence is not None:
            head = min(head, self.end_sequence)
        nxt = self.position + 1
        if nxt > head:
            self.state = "TAILING"
            return 0
        done = 0
        not_ready = False
        for seq in range(nxt, min(nxt + self.batch_size, head + 1)):
            try:
                payload = self.endpoint.fetch(seq)
            except SequenceNotReady:
                # state file ahead of the published files — tail and retry
                self.state = "TAILING"
                not_ready = True
                break
            self.process(seq, payload)
            self._commit(seq)
            done += 1
        if not_ready:
            # keep TAILING even when done>0: reverting to CATCH_UP here
            # would force an extra state-file fetch + failed payload fetch
            # on every tail cycle
            pass
        elif done and self.position is not None and self.position >= head:
            self.state = "TAILING"
        elif done:
            self.state = "CATCH_UP"
        return done

    def run(
        self, max_steps: int | None = None, stop_when_caught_up: bool = True
    ) -> int:
        """Run the loop; returns total sequences processed. With
        `stop_when_caught_up` (tests/batch), exits on the first caught-up
        tail; otherwise sleeps `poll_interval_s` and keeps tailing."""
        total = 0
        steps = 0
        while True:
            n = self.step()
            total += n
            steps += 1
            if max_steps is not None and steps >= max_steps:
                return total
            if self.state == "TAILING":
                if stop_when_caught_up:
                    return total
                if self.end_sequence is not None and (
                    self.position is not None
                    and self.position >= self.end_sequence
                ):
                    return total
                time.sleep(self.poll_interval_s)
                self.state = "CATCH_UP"


def poll_to_dropdir(
    endpoint: ReplicationEndpoint,
    drop_dir: str,
    suffix: str,
    **poller_kwargs,
) -> ReplicationPoller:
    """Poller whose process() writes each sequence payload into `drop_dir`
    as `<sequence><suffix>` — the layout `sources.replication`'s batch and
    Structured Streaming file sources consume. Write is atomic
    (tmp + rename) so the stream never reads a half-written file."""
    os.makedirs(drop_dir, exist_ok=True)

    def write(sequence: int, payload: bytes) -> None:
        final = os.path.join(drop_dir, f"{sequence}{suffix}")
        tmp = final + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.rename(tmp, final)

    return ReplicationPoller(endpoint=endpoint, process=write, **poller_kwargs)
