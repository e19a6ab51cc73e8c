"""
Rich-based progress bars (reference: kraken/lib/progress.py).
"""
from typing import Optional

__all__ = ['KrakenProgressBar', 'KrakenDownloadProgressBar']

try:
    from rich.progress import (BarColumn, DownloadColumn, Progress, TextColumn,
                               TimeElapsedColumn, TimeRemainingColumn)

    class KrakenProgressBar(Progress):
        """Progress bar with task description, percentage, and timings."""

        def __init__(self, *args, **kwargs):
            columns = [TextColumn('[progress.description]{task.description}'),
                       BarColumn(),
                       TextColumn('[progress.percentage]{task.percentage:>3.0f}%'),
                       TimeRemainingColumn(),
                       TimeElapsedColumn()]
            kwargs['refresh_per_second'] = 1
            super().__init__(*columns, *args, **kwargs)

    class KrakenDownloadProgressBar(Progress):
        """Progress bar with download size/speed columns."""

        def __init__(self, *args, **kwargs):
            columns = [TextColumn('[progress.description]{task.description}'),
                       BarColumn(),
                       TextColumn('[progress.percentage]{task.percentage:>3.0f}%'),
                       DownloadColumn(),
                       TimeRemainingColumn(),
                       TimeElapsedColumn()]
            kwargs['refresh_per_second'] = 1
            super().__init__(*columns, *args, **kwargs)

except ImportError:
    class _NoopBar:
        def __init__(self, *args, **kwargs):
            pass

        def __enter__(self):
            return self

        def __exit__(self, *args):
            return False

        def add_task(self, *args, **kwargs):
            return 0

        def update(self, *args, **kwargs):
            pass

    KrakenProgressBar = _NoopBar
    KrakenDownloadProgressBar = _NoopBar
