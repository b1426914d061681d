"""Epoch timing helper (util/epoch_timer.py parity)."""


def epoch_time(start_time: float, end_time: float):
    elapsed = end_time - start_time
    mins = int(elapsed / 60)
    secs = int(elapsed - mins * 60)
    return mins, secs
