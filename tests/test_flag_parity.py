"""CLI flag-parity audit vs the reference's argparse surface.

Extracts every short flag the reference's interface.py registers per entry
point (ref: call_optimizeparser :140, call_nebparser :243, call_mdparser
:341, call_ieipparser :81, parser_for_biasforce :205) and checks that our
corresponding entry point accepts it. Flags we deliberately do not map are
whitelisted with a reason; the audit fails if the unexplained gap is ever
non-empty, so a regression or a new reference flag shows up here.
"""

import re

import pytest

import multioptpy_tpu.cli as cli

REF_INTERFACE = "/root/reference/multioptpy/interface.py"

# deliberately unmapped flags -> reason
WHITELIST = {
    # replaced by a first-class equivalent rather than a flag
    "-d": "mapped (alias of -delta; both accepted)",
    # host-QM process plumbing with no TPU counterpart
    "-addint": "psi4 multi-input batching; host-bridge covers single jobs",
    # MD flags whose semantics are folded into existing options
    "-traj": "mapped to mdmain -ntraj",
}


def _ref_sections():
    src = open(REF_INTERFACE).read()
    sections = {}
    bounds = []
    for m in re.finditer(r"def (call_\w+parser|parser_for_biasforce|"
                         r"init_parser)\(", src):
        bounds.append((m.group(1), m.start()))
    bounds.append(("<end>", len(src)))
    for (name, start), (_, end) in zip(bounds, bounds[1:]):
        flags = re.findall(r"add_argument\(\s*['\"](-[^'\"]+)['\"]", src[start:end])
        sections[name] = [f for f in flags if not f.startswith("--")]
    return sections


def _our_flags(entry):
    """Capture the ArgumentParser an entry point builds (they all call
    parse_args immediately, so intercept it)."""
    import argparse
    captured = {}
    orig = argparse.ArgumentParser.parse_args

    def fake(self, args=None, namespace=None):
        captured["p"] = self
        raise SystemExit(0)

    argparse.ArgumentParser.parse_args = fake
    try:
        try:
            entry([])
        except SystemExit:
            pass
    finally:
        argparse.ArgumentParser.parse_args = orig
    return set(captured["p"]._option_string_actions.keys())


ENTRY_MAP = {
    "optmain": (cli.run_optmain, ["call_optimizeparser",
                                  "parser_for_biasforce"]),
    "nebmain": (cli.run_nebmain, ["call_nebparser", "parser_for_biasforce"]),
    "mdmain": (cli.run_mdmain, ["call_mdparser", "parser_for_biasforce"]),
    "ieipmain": (cli.run_ieipmain, ["call_ieipparser",
                                    "parser_for_biasforce"]),
}


@pytest.mark.parametrize("entry_name", list(ENTRY_MAP))
def test_reference_flags_accepted(entry_name):
    sections = _ref_sections()
    entry, section_names = ENTRY_MAP[entry_name]
    ours = _our_flags(entry)
    ref_flags = set()
    for s in section_names:
        ref_flags |= set(sections.get(s, []))
    missing = sorted(f for f in ref_flags
                     if f not in ours and f not in WHITELIST)
    assert len(missing) == 0, (
        f"{entry_name}: reference flags without a mapping and without a "
        f"whitelist reason: {missing}")


def test_global_gap_below_ten():
    """VERDICT round-3 acceptance: < 10 unmapped reference flags overall,
    every one with a documented reason."""
    sections = _ref_sections()
    all_ref = set()
    for name in ("call_optimizeparser", "call_nebparser", "call_mdparser",
                 "call_ieipparser", "parser_for_biasforce"):
        all_ref |= set(sections.get(name, []))
    all_ours = set()
    for entry, _ in ENTRY_MAP.values():
        all_ours |= _our_flags(entry)
    unmapped = sorted(f for f in all_ref if f not in all_ours)
    unexplained = [f for f in unmapped if f not in WHITELIST]
    assert len(unmapped) < 10, f"unmapped reference flags: {unmapped}"
    assert not unexplained, f"unmapped without documented reason: {unexplained}"
