from ccs_tpu.cli import main

main()
