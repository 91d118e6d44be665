import sys

from srsem.cli.main import main

sys.exit(main())
