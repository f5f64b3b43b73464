#!/usr/bin/env python
"""Create an index file for a webdataset tar (reference tools/wds2idx):
lines of '<ext> <offset> <size> <basename>'."""
import sys, tarfile

if __name__ == "__main__":
    if len(sys.argv) != 3:
        print("usage: wds2idx <tar> <index>")
        sys.exit(1)
    with tarfile.open(sys.argv[1]) as tar, open(sys.argv[2], "w") as out:
        for m in tar:
            if m.isfile():
                base, _, ext = m.name.partition(".")
                out.write(f"{ext} {m.offset_data} {m.size} {base}\n")
