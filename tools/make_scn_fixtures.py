"""Regenerate the in-repo `.scn` fixture zoo (tests/fixtures/scenes/) from the
registry builders via scenes/parser.write_scn. The builders are themselves
parity-tested against /root/reference/smallptgpu-v1.6/scenes/*.scn
(tests/test_scenes_parity.py), so the fixtures carry the same scene data
without copying reference files into the repo."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from se195_raytracer_tpu.scenes import registry  # noqa: E402
from se195_raytracer_tpu.scenes.parser import write_scn  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "scenes")


def main():
    os.makedirs(OUT, exist_ok=True)
    for name in ("simple", "cornell_scn", "cornell_large", "caustic",
                 "caustic3", "complex"):
        path = os.path.join(OUT, f"{name}.scn")
        write_scn(registry.SCENES[name](), path)
        print("wrote", path)


if __name__ == "__main__":
    main()
