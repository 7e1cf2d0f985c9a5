import sys

from tpuseg.cli.main import main

sys.exit(main())
