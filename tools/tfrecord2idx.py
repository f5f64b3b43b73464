#!/usr/bin/env python
"""Create an index file for a TFRecord (reference tools/tfrecord2idx)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from dali_tpu import tfrecord

if __name__ == "__main__":
    if len(sys.argv) != 3:
        print("usage: tfrecord2idx <tfrecord> <index>")
        sys.exit(1)
    tfrecord.write_index(sys.argv[1], sys.argv[2])
