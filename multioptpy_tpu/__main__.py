"""`python -m multioptpy_tpu <command> ...` dispatch.

Mirrors the console-script entry points of pyproject.toml so the CLI works
from a source checkout without installation (the reference relies on
installed scripts only, Entrypoints/core.py)."""

import sys

from multioptpy_tpu import cli

COMMANDS = {
    "optmain": cli.run_optmain,
    "nebmain": cli.run_nebmain,
    "mdmain": cli.run_mdmain,
    "ircmain": cli.run_ircmain,
    "confsearch": cli.run_confsearch,
    "relaxedscan": cli.run_relaxedscan,
    "run_autots": cli.run_autots_cli,
    "orientsearch": cli.run_orientsearch,
    "ieipmain": cli.run_ieipmain,
    "run_mapper": cli.run_mapper_cli,
}


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        names = " ".join(COMMANDS)
        print(f"usage: python -m multioptpy_tpu <command> [args]\n"
              f"commands: {names}")
        return 0 if argv else 2
    cmd = argv.pop(0)
    if cmd not in COMMANDS:
        print(f"error: unknown command '{cmd}' "
              f"(choose from {', '.join(COMMANDS)})", file=sys.stderr)
        return 2
    return COMMANDS[cmd](argv)


if __name__ == "__main__":
    sys.exit(main())
