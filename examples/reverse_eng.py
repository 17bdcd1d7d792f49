"""Reverse-engineer an effect parameter by gradient descent (script form).

The reference ships examples/reverse_eng.py but it is stale — it calls
``distortion(x, drive)`` without ``sample_rate`` and crashes
(reverse_eng.py:20,:30). This is the working equivalent; it simply runs
the quickstart recipe (see examples/quickstart.py for the annotated
version and examples/quickstart.ipynb for the notebook).
"""

from quickstart import main

if __name__ == "__main__":
    main()
