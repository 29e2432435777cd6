import sys

from guetzli_tpu.cli import main

sys.exit(main())
