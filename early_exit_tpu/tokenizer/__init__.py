from early_exit_tpu.tokenizer.bpe import SentencePieceBPE, load_tokenizer
from early_exit_tpu.tokenizer.chars import CharTokenizer
