"""
kraken_tpu.lib.telemetry
~~~~~~~~~~~~~~~~~~~~~~~~

Lightweight host<->device transfer accounting.

The inference paths call :func:`record_up` / :func:`record_down` with the
payload byte counts at every device boundary crossing (recognition batch
uploads, segmentation page uploads, heatmap/decode-tensor downloads).
The calls are no-ops unless a collector is active, so production code
pays one attribute load per dispatch.

Used by bench.py to report a bytes-up/bytes-down-per-page account per
benchmark leg alongside the concurrently sampled link bandwidth (the
tunnel to the TPU swings 2-10x between minutes; a leg's throughput ratio
is uninterpretable without knowing how many bytes it moved and how fast
the link was while it ran).
"""
import contextlib
from dataclasses import dataclass, field

__all__ = ['TransferStats', 'collect', 'record_up', 'record_down']

_active: list = []


@dataclass
class TransferStats:
    """Byte/call counters for one collection scope."""
    up_bytes: int = 0
    down_bytes: int = 0
    up_calls: int = 0
    down_calls: int = 0

    def as_dict(self, pages: int = 1) -> dict:
        per = max(pages, 1)
        return {'up_mb_per_page': round(self.up_bytes / per / 1e6, 3),
                'down_mb_per_page': round(self.down_bytes / per / 1e6, 3),
                'up_calls': self.up_calls,
                'down_calls': self.down_calls,
                # dispatch-latency view: every upload call pays the link
                # round trip unless overlapped; per-page counts are what the
                # stage budget can be compared against
                'up_calls_per_page': round(self.up_calls / per, 1),
                'down_calls_per_page': round(self.down_calls / per, 1)}


def record_up(nbytes: int) -> None:
    """Accounts a host->device payload of `nbytes` to active collectors."""
    for s in _active:
        s.up_bytes += nbytes
        s.up_calls += 1


def record_down(nbytes: int) -> None:
    """Accounts a device->host payload of `nbytes` to active collectors."""
    for s in _active:
        s.down_bytes += nbytes
        s.down_calls += 1


@contextlib.contextmanager
def collect():
    """Context manager yielding a TransferStats that accumulates every
    device-boundary transfer recorded while the scope is active. Scopes
    nest (each transfer is accounted to all active collectors)."""
    stats = TransferStats()
    _active.append(stats)
    try:
        yield stats
    finally:
        _active.remove(stats)
