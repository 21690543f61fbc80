"""`python -m fadtk_tpu.embeds` — module-path parity with `fadtk.embeds`
(reference fadtk/embeds.py; README.md:56)."""
from .cli.embeds import main

if __name__ == "__main__":
    main()
