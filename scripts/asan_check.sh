#!/usr/bin/env bash
# AddressSanitizer harness for the native runtime.
#
# Builds an ASan instrumented libyabpe_native and drives every native entry
# point end to end (scanner, counter, add_table, merge, word-id paths,
# 243- and 32k-merge training, whole-text encode, cache clear). The JAX
# test suite cannot run under ASan (XLA's CPU JIT generates code ASan
# faults on), so this drives the C++ surface directly; the pure-native
# pytest files run too.
#
# The reference has no sanitizer harness of any kind (SURVEY.md §5.2).
set -euo pipefail
cd "$(dirname "$0")/.."

g++ -O1 -g -fsanitize=address -fno-omit-frame-pointer -shared -fPIC \
    -std=c++17 -o native/build/libyabpe_native_asan.so native/yabpe_native.cpp

export YABPE_NATIVE_SO="$PWD/native/build/libyabpe_native_asan.so"
export LD_PRELOAD="$(g++ -print-file-name=libasan.so)"
export ASAN_OPTIONS=detect_leaks=0

python -m pytest tests/test_native.py tests/test_pretok.py -q -p no:cacheprovider

python - <<'EOF'
import sys
sys.path.insert(0, "src")
from pathlib import Path
from yabpe_tpu import native

data = Path("/root/reference/tests/fixtures_gpt2/corpus.en").read_bytes()
c = native.NativeCounter(("<|endoftext|>",))
c.add(data)
w, l, ct = c.export()
merges = native.train_host_raw(w, l, ct, 243, 1)
assert len(merges) == 243
c2 = native.NativeCounter(("<|endoftext|>",))
occ = c2.add_word_ids_specials(data)
c.add_table(w, l, ct)
c.merge(c2)

from yabpe_tpu.tok.symbols import extended_symbol_tables
vocab = {bytes([i]): i for i in range(256)}
vid = 256
for a, b in merges:
    m = a + b
    if m not in vocab:
        vocab[m] = vid
        vid += 1
_, live, out_ids = extended_symbol_tables(vocab, merges, 0)
enc = native.NativeEncoder(live, out_ids)
ids = enc.encode_text(data, [b"<|endoftext|>"], [-1])
assert len(ids) > 0
enc.encode_segment(data[:5000])
enc.cache_clear()
enc.close()
c.close()
c2.close()
print("ASan native end-to-end: OK")
EOF

# ---- ThreadSanitizer pass over the threaded native paths --------------------
g++ -O1 -g -fsanitize=thread -fno-omit-frame-pointer -shared -fPIC \
    -std=c++17 -o native/build/libyabpe_native_tsan.so native/yabpe_native.cpp

YABPE_NATIVE_SO="$PWD/native/build/libyabpe_native_tsan.so" \
LD_PRELOAD="$(g++ -print-file-name=libtsan.so)" \
TSAN_OPTIONS=report_bugs=1:halt_on_error=1 \
python - <<'EOF2'
import sys
sys.path.insert(0, "src")
from yabpe_tpu.pretok.ingest import count_pretokens_raw
w, l, c = count_pretokens_raw(
    ["/root/reference/tests/fixtures_gpt2/corpus.en"],
    ["<|endoftext|>"], chunk_size_bytes=16384, max_workers=4)
assert len(l) > 0

from yabpe_tpu import BBPETokenizer
from yabpe_tpu.io import gpt2 as gpt2io
merges = gpt2io.load_gpt2_merges(
    "/root/reference/tests/fixtures_gpt2/gpt2_merges.txt")
vocab = gpt2io.load_gpt2_vocab("tests/fixtures_gpt2/gpt2_vocab.json")
tok = BBPETokenizer(vocab=vocab, merges=merges,
                    special_tokens=["<|endoftext|>"])
ids = tok.encode_file(
    "/root/reference/tests/fixtures_gpt2/tinystories_sample.txt",
    max_workers=4, chunk_bytes=16384)
from concurrent.futures import ThreadPoolExecutor
texts = ["hello world " * 50, "Straße 中文 👋 " * 30] * 8
with ThreadPoolExecutor(max_workers=4) as pool:
    results = list(pool.map(tok.encode, texts))
assert results == [tok.encode(t) for t in texts]
print("TSan threaded paths: OK")
EOF2
