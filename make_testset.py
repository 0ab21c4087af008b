"""CLI: generate a reference-schema testset split JSON for a corpus.

The reference ships fixed split files (``testset_largedev.json``: 200 dev /
100 test; ``testset_origdev.json``: 30 dev / 100 test) keyed by
``[book, sentence_index]`` (``read_emg.py:151-154,179-184``). For a new or
synthetic corpus this tool produces the same schema by seeded sampling of
the discovered utterance locations:

    python make_testset.py --silent_data_directories ... \
        --voiced_data_directories ... --testset_file out.json \
        --dev_size 200 --test_size 100 --split_seed 0
"""

import json
import os
import random
import re
import sys


def discover_locations(directories):
    """All distinct [book, sentence_index] pairs across session dirs
    (the dataset's discovery rule, ``read_emg.py:171-188``)."""
    locations = []
    seen = set()
    for root in directories:
        for session in sorted(os.listdir(root)):
            d = os.path.join(root, session)
            for fname in sorted(os.listdir(d)):
                if re.match(r"\d+_info.json", fname) is None:
                    continue
                with open(os.path.join(d, fname)) as f:
                    info = json.load(f)
                if info["sentence_index"] < 0:
                    continue
                loc = (info["book"], info["sentence_index"])
                if loc not in seen:
                    seen.add(loc)
                    locations.append(list(loc))
    return locations


def make_split(locations, dev_size, test_size, seed):
    rng = random.Random(seed)
    picked = rng.sample(range(len(locations)),
                        min(dev_size + test_size, len(locations)))
    dev = [locations[i] for i in picked[:dev_size]]
    test = [locations[i] for i in picked[dev_size:]]
    return {"dev": dev, "test": test}


def main():
    from absl import flags

    F = flags.FLAGS
    dirs = list(F.silent_data_directories) + \
        list(F.voiced_data_directories)
    locations = discover_locations(dirs)
    split = make_split(locations, F.dev_size, F.test_size, F.split_seed)
    if len(split["dev"]) < F.dev_size or len(split["test"]) < F.test_size:
        print(f"WARNING: only {len(locations)} locations available — "
              f"requested {F.dev_size} dev + {F.test_size} test; the "
              "train split will be small or empty", file=sys.stderr)
    with open(F.testset_file, "w") as f:
        json.dump(split, f)
    print(f"wrote {F.testset_file}: {len(split['dev'])} dev / "
          f"{len(split['test'])} test of {len(locations)} locations")


if __name__ == "__main__":
    from absl import flags

    from silent_speech_tpu.config import define_flags

    define_flags()
    if "dev_size" not in flags.FLAGS:
        flags.DEFINE_integer("dev_size", 200, "dev-set sentence count "
                             "(largedev uses 200, origdev 30)")
        flags.DEFINE_integer("test_size", 100, "test-set sentence count")
        flags.DEFINE_integer("split_seed", 0, "sampling seed")
    flags.FLAGS(sys.argv)
    main()
