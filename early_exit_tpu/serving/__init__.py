from early_exit_tpu.serving.streaming import (StreamingRecognizer,  # noqa: F401
                                              StreamPool)  # noqa: F401
