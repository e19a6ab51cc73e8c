from kraken_tpu.ketos import cli

if __name__ == '__main__':
    cli()
