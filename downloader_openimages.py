#!/usr/bin/env python
"""Download the OpenImages v6 training corpus (300k train / 10k test) used
by the reference training recipe (`downloader_openimages.py:6-19`,
README.md:89).

Requires the optional `fiftyone` package and network access; neither is
part of the core framework, so this script degrades to a clear error.
After downloading, arrange images as  <root>/train/*.jpg  and
<root>/test/*.jpg  for `train.py -d <root>`.
"""

import sys


def main(train_samples: int = 300_000, test_samples: int = 10_000):
    try:
        import fiftyone.zoo as foz
    except ImportError:
        print(
            "fiftyone is not installed; install it (pip install fiftyone) "
            "on a machine with network access to fetch OpenImages v6.",
            file=sys.stderr,
        )
        sys.exit(1)

    foz.load_zoo_dataset(
        "open-images-v6",
        split="train",
        max_samples=train_samples,
        label_types=[],
    )
    foz.load_zoo_dataset(
        "open-images-v6",
        split="test",
        max_samples=test_samples,
        label_types=[],
    )


if __name__ == "__main__":
    main()
