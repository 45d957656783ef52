// DSP golden harness: runs the REFERENCE front-end modules over stdin.
//
// Usage:
//   dsp_harness rrc            float32 in -> float32 out (wide)
//   dsp_harness rrc-narrow     float32 in -> float32 out (narrow)
//   dsp_harness gfsk <sps>     float32 in -> dibits out
//   dsp_harness fsk <sps> [i]  float32 in -> bits out (i = invert)
//   dsp_harness dv             int16 in -> int16 out (digitalvoice filter)
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>
#include <unistd.h>

#include "csdr/module.hpp"

#include "rrc_filter.hpp"
#include "fsk_demodulator.hpp"
#include "gfsk_demodulator.hpp"
#include "digitalvoice_filter.hpp"

namespace {

template <typename T>
class VectorReader: public Csdr::Reader<T> {
    public:
        explicit VectorReader(std::vector<T> d): data(std::move(d)) {}
        size_t available() override { return data.size() - pos; }
        T* getReadPointer() override { return data.data() + pos; }
        void advance(size_t n) override { pos += n; }
    private:
        std::vector<T> data;
        size_t pos = 0;
};

template <typename T>
class VectorWriter: public Csdr::Writer<T> {
    public:
        VectorWriter() { data.resize(1 << 20); }
        size_t writeable() override { return data.size() - fill; }
        T* getWritePointer() override {
            if (data.size() - fill < (1 << 16)) data.resize(data.size() * 2);
            return data.data() + fill;
        }
        void advance(size_t n) override { fill += n; }
        std::vector<T> data;
        size_t fill = 0;
};

template <typename T>
std::vector<T> read_all() {
    std::vector<T> out;
    T buf[16384];
    ssize_t n;
    while ((n = read(0, buf, sizeof(buf))) > 0) {
        out.insert(out.end(), buf, buf + n / sizeof(T));
    }
    return out;
}

template <typename T, typename U>
void run(Csdr::Module<T, U>* module) {
    auto* reader = new VectorReader<T>(read_all<T>());
    auto* writer = new VectorWriter<U>();
    module->setReader(reader);
    module->setWriter(writer);
    while (module->canProcess()) module->process();
    fwrite(writer->data.data(), sizeof(U), writer->fill, stdout);
    fflush(stdout);
}

}  // namespace

int main(int argc, char** argv) {
    if (argc < 2) return 2;
    std::string mode = argv[1];
    if (mode == "rrc") {
        run(new Digiham::RrcFilter::WideRrcFilter());
    } else if (mode == "rrc-narrow") {
        run(new Digiham::RrcFilter::NarrowRrcFilter());
    } else if (mode == "gfsk") {
        unsigned int sps = argc > 2 ? atoi(argv[2]) : 10;
        run(new Digiham::Fsk::GfskDemodulator(sps));
    } else if (mode == "fsk") {
        unsigned int sps = argc > 2 ? atoi(argv[2]) : 40;
        bool invert = argc > 3 && argv[3][0] == 'i';
        run(new Digiham::Fsk::FskDemodulator(sps, invert));
    } else if (mode == "dv") {
        run(new Digiham::DigitalVoice::DigitalVoiceFilter());
    } else {
        return 2;
    }
    return 0;
}
