import sys

from tpualign.cli import main

sys.exit(main())
