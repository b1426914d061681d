"""Native library loader: builds csrc/ into one shared object on demand.

The reference's native surface (vendored SentencePiece C++, flashlight /
CUDA decoders, torchaudio C++ ops) maps here to `libeet_native.so`,
compiled from csrc/ with the system toolchain and loaded via ctypes (no
pybind11 in the image). Build is lazy + cached by source mtimes.
"""

from __future__ import annotations

import ctypes
import glob
import os
import subprocess
import threading

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CSRC = os.path.join(_REPO, "csrc")
_BUILD_DIR = os.path.join(_REPO, "build")
_LIB = os.path.join(_BUILD_DIR, "libeet_native.so")
_LOCK = threading.Lock()
_CACHED = None


def _sources():
    srcs = sorted(glob.glob(os.path.join(_CSRC, "**", "*.cc"),
                            recursive=True))
    # files with a main() build into CLI binaries, not the shared lib
    return [s for s in srcs if not s.endswith("_cli.cc")]


def build_cli(verbose: bool = False) -> str:
    """Build the `eet_spm` CLI binary (spm_train/encode/decode surface)."""
    os.makedirs(_BUILD_DIR, exist_ok=True)
    out = os.path.join(_BUILD_DIR, "eet_spm")
    srcs = [os.path.join(_CSRC, "tokenizer", "spm_cli.cc"),
            os.path.join(_CSRC, "tokenizer", "bpe_tokenizer.cc"),
            os.path.join(_CSRC, "tokenizer", "bpe_trainer.cc"),
            os.path.join(_CSRC, "tokenizer", "unigram_trainer.cc"),
            os.path.join(_CSRC, "tokenizer", "charsmap_builder.cc")]
    cmd = ["g++", "-O3", "-std=c++17", "-o", out, *srcs]
    if verbose:
        print("building CLI:", " ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=not verbose)
    return out


def _stale() -> bool:
    if not os.path.exists(_LIB):
        return True
    lib_mtime = os.path.getmtime(_LIB)
    return any(os.path.getmtime(s) > lib_mtime for s in _sources())


def build(verbose: bool = False) -> str:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    srcs = _sources()
    if not srcs:
        raise RuntimeError(f"no C++ sources under {_CSRC}")
    cmd = ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-o", _LIB,
           *srcs]
    if verbose:
        print("building native lib:", " ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=not verbose)
    return _LIB


def get_lib() -> ctypes.CDLL:
    """Returns the loaded native library, building it if missing/stale.

    EET_NATIVE_LIB overrides the library path (e.g. the ASan build from
    `make -C csrc asan`)."""
    global _CACHED
    override = os.environ.get("EET_NATIVE_LIB")
    with _LOCK:
        if override:
            if _CACHED is None:
                lib = ctypes.CDLL(os.path.join(_REPO, override)
                                  if not os.path.isabs(override)
                                  else override)
                _configure(lib)
                _CACHED = lib
            return _CACHED
        if _CACHED is not None and not _stale():
            return _CACHED
        if _stale():
            build()
        lib = ctypes.CDLL(_LIB)
        _configure(lib)
        _CACHED = lib
        return lib


def _configure(lib: ctypes.CDLL) -> None:
    c = ctypes
    lib.eet_bpe_load.restype = c.c_void_p
    lib.eet_bpe_load.argtypes = [c.c_char_p]
    lib.eet_bpe_free.argtypes = [c.c_void_p]
    lib.eet_bpe_piece_size.restype = c.c_int
    lib.eet_bpe_piece_size.argtypes = [c.c_void_p]
    lib.eet_bpe_special.restype = c.c_int
    lib.eet_bpe_special.argtypes = [c.c_void_p, c.c_int]
    lib.eet_bpe_piece_type.restype = c.c_int
    lib.eet_bpe_piece_type.argtypes = [c.c_void_p, c.c_int]
    lib.eet_bpe_id_to_piece.restype = c.c_int
    lib.eet_bpe_id_to_piece.argtypes = [c.c_void_p, c.c_int, c.c_char_p,
                                        c.c_int]
    lib.eet_bpe_encode.restype = c.c_int
    lib.eet_bpe_encode.argtypes = [c.c_void_p, c.c_char_p,
                                   c.POINTER(c.c_int), c.c_int]
    lib.eet_bpe_encode_n.restype = c.c_int
    lib.eet_bpe_encode_n.argtypes = [c.c_void_p, c.c_char_p, c.c_long,
                                     c.POINTER(c.c_int), c.c_int]
    lib.eet_bpe_decode.restype = c.c_int
    lib.eet_bpe_decode.argtypes = [c.c_void_p, c.POINTER(c.c_int), c.c_int,
                                   c.c_char_p, c.c_int]

    lib.eet_lex_create.restype = c.c_void_p
    lib.eet_lex_free.argtypes = [c.c_void_p]
    lib.eet_lex_add.argtypes = [c.c_void_p, c.c_char_p]
    lib.eet_lex_contains.restype = c.c_int
    lib.eet_lex_contains.argtypes = [c.c_void_p, c.c_char_p]
    lib.eet_lex_closest.restype = c.c_int
    lib.eet_lex_closest.argtypes = [c.c_void_p, c.c_char_p, c.c_char_p,
                                    c.c_int]

    lib.eet_flac_decode.restype = c.c_void_p
    lib.eet_flac_decode.argtypes = [c.c_char_p]
    lib.eet_flac_num_samples.restype = c.c_long
    lib.eet_flac_num_samples.argtypes = [c.c_void_p]
    lib.eet_flac_sample_rate.restype = c.c_int
    lib.eet_flac_sample_rate.argtypes = [c.c_void_p]
    lib.eet_flac_channels.restype = c.c_int
    lib.eet_flac_channels.argtypes = [c.c_void_p]
    lib.eet_flac_copy.argtypes = [c.c_void_p, c.POINTER(c.c_int32)]
    lib.eet_flac_free.argtypes = [c.c_void_p]

    lib.eet_bpe_train.restype = c.c_int
    lib.eet_bpe_train.argtypes = [c.c_char_p, c.c_char_p, c.c_int,
                                  c.c_int, c.c_int, c.c_int, c.c_int,
                                  c.c_char_p]
    lib.eet_charsmap_compile.restype = c.c_long
    lib.eet_charsmap_compile.argtypes = [c.c_char_p, c.c_char_p]
    lib.eet_spm_train.restype = c.c_int
    lib.eet_spm_train.argtypes = [c.c_char_p, c.c_char_p, c.c_int,
                                  c.c_int, c.c_int, c.c_int, c.c_int,
                                  c.c_char_p, c.c_int]
    lib.eet_spm_train_norm.restype = c.c_int
    lib.eet_spm_train_norm.argtypes = [c.c_char_p, c.c_char_p, c.c_int,
                                       c.c_int, c.c_int, c.c_int, c.c_int,
                                       c.c_char_p, c.c_int, c.c_char_p,
                                       c.c_char_p]
    # _ex: trailing byte_fallback flag (adds the 256 <0xXX> BYTE pieces)
    lib.eet_spm_train_norm_ex.restype = c.c_int
    lib.eet_spm_train_norm_ex.argtypes = [c.c_char_p, c.c_char_p, c.c_int,
                                          c.c_int, c.c_int, c.c_int,
                                          c.c_int, c.c_char_p, c.c_int,
                                          c.c_char_p, c.c_char_p, c.c_int]
    lib.eet_bpe_normalize.restype = c.c_int
    lib.eet_bpe_normalize.argtypes = [c.c_void_p, c.c_char_p, c.c_char_p,
                                      c.c_int]
