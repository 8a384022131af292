"""L7: command-line applications.

Every reference tool (SURVEY.md §2.1/§2.2) maps to a subcommand of
``python -m mauvealigner_tpu.tools <toolName> ...`` keeping the reference's
tool names.  See cli.py for the registry.
"""
