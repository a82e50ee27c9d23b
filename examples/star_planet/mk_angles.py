"""Emit star_planet inputs over a sweep of observer phase angles for the
transit animation (reference: examples/star_planet/mk_angles.py +
mk_animation.py)."""
import os

HERE = os.path.dirname(os.path.abspath(__file__))
BASE = os.path.join(HERE, 'star_planet.in')


def main(angles=range(0, 181, 15)):
    with open(BASE) as fh:
        base = fh.read()
    for a in angles:
        name = f'star_planet_a{a:03d}'
        txt = base.replace("par%alpha(1) = 0.0",
                           f"par%alpha(1) = {float(a):.1f}")
        txt = txt.replace("par%out_file = 'star_planet'",
                          f"par%out_file = '{name}'")
        with open(os.path.join(HERE, name + '.in'), 'w') as fh:
            fh.write(txt)
        print(name + '.in')


if __name__ == '__main__':
    main()
