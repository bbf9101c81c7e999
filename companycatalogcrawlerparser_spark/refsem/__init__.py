"""Pure-Python, quirk-exact reference semantics (the correctness oracle).

Every function in this package is a faithful transcription of observable
behavior in the reference (``/root/reference``), including its .NET string
quirks (SURVEY.md Appendix Q1-Q12). No Spark imports anywhere — the Spark
column-expression implementations in ``..functions`` are tested against
these on adversarial inputs.
"""
