import json
import os

from early_exit_tpu.utils import MetricsLogger, WerAccumulator, wer
from early_exit_tpu.utils.epoch_timer import epoch_time


def test_wer_basic():
    assert wer("the cat sat", "the cat sat") == 0.0
    assert wer("the cat sat", "the cat") == 1 / 3
    assert wer("the cat sat", "the bat sat") == 1 / 3
    assert wer("a", "a b") == 1.0
    assert wer("", "") == 0.0


def test_wer_accumulator_corpus_level():
    acc = WerAccumulator()
    acc.add("the cat", "the cat")
    acc.add("a b c d", "a x c")       # 1 sub + 1 del = 2 errors / 4
    assert acc.utterances == 2
    assert acc.words == 6
    assert abs(acc.value - 2 / 6) < 1e-9


def test_metrics_logger_jsonl(tmp_path):
    d = str(tmp_path / "runs")
    log = MetricsLogger(d, tensorboard=False)
    log.log(1, {"loss": 3.5, "lr": 1e-4})
    log.log(2, {"loss": 3.0})
    log.close()
    with open(os.path.join(d, "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    assert recs[0]["step"] == 1 and abs(recs[0]["loss"] - 3.5) < 1e-9
    assert recs[1]["step"] == 2


def test_epoch_time():
    assert epoch_time(0.0, 125.0) == (2, 5)


def test_step_timer():
    from early_exit_tpu.utils.profiling import StepTimer
    t = StepTimer(warmup_steps=1)
    for _ in range(3):
        t.start()
        t.stop(audio_seconds=10.0)
    assert t.steps_per_sec > 0
    assert t.rtf_x > 0
