"""Tree I/O and visualization: parse, clone, export newick/ASCII/SVG.

Port of reference examples/newick-export + load-utree + utree_svg."""

from _common import NEWICK

from libpll_tpu.tree import utree as ut
from libpll_tpu.tree.svg import SvgAttrib, export_svg


def main():
    tree = ut.parse_newick_string(NEWICK)
    print("parsed", tree.tip_count, "taxa")
    print(ut.show_ascii(tree.root))
    clone = ut.clone(tree)
    print("newick (clone):", ut.export_newick(clone.root))
    svg = export_svg(tree, attr=SvgAttrib(width=800, tip_spacing=24))
    with open("/tmp/libpll_tpu_example_tree.svg", "w") as fh:
        fh.write(svg)
    print("SVG written to /tmp/libpll_tpu_example_tree.svg "
          f"({len(svg)} bytes)")


if __name__ == "__main__":
    main()
